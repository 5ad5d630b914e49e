"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, Arrow batching via
``mapInPandas``, partition sizing — is real and tested; the actual codec
step is stubbed behind a try-import (the decode libraries are not in this
container) with a deterministic byte-histogram feature as the fallback, so
the pipeline shape is exercised end-to-end.

Scale notes: blobs inflate row size, so the partition knob that matters is
``spark.sql.files.maxPartitionBytes`` (keep Arrow batches well under
executor memory); feature extraction itself is shuffle-free. Decoded
features land as fixed-width arrays — columnar, prunable, joinable with the
embedding operators in datapipe.similarity.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_FIELDS = (
    "n_bytes bigint, magic string, media_kind string"
)

_MAGIC_KINDS = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "riff"),  # wav/webp container
    (b"OggS", "audio/ogg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def blob_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Typed metadata for an opaque binary column — Catalyst-only (no
    Python): byte length, magic prefix (hex), sniffed media kind."""
    b = F.col(blob_col)
    magic = F.hex(F.substring(b, 1, 4))
    kind = F.lit("application/octet-stream")
    for prefix, name in reversed(_MAGIC_KINDS):
        hexpref = prefix.hex().upper()
        kind = F.when(magic.startswith(F.lit(hexpref)), F.lit(name)).otherwise(kind)
    return df.withColumn("n_bytes", F.length(b).cast("long")).withColumn(
        "magic", magic
    ).withColumn("media_kind", kind)


def _bin_shift(bins: int) -> int:
    """Right-shift mapping a uint8 onto exactly ``bins`` buckets. Rejects
    non-power-of-two bins up front — a silent log2 truncation would emit
    feature vectors WIDER than ``bins`` (e.g. bins=10 → shift 4 → values
    0..15), breaking every fixed-width downstream consumer."""
    if bins < 1 or bins > 256 or (bins & (bins - 1)) != 0:
        raise ValueError(f"bins must be a power of two in [1, 256], got {bins}")
    return 8 - bins.bit_length() + 1


def _byte_histogram(data: bytes, bins: int = 16) -> list[float]:
    """Deterministic fallback feature: normalized histogram of byte values
    (bins of width 256//bins). Stands in for decoded-image features so the
    downstream plumbing (fixed-width float arrays) is real."""
    shift = _bin_shift(bins)
    if not data:
        return [0.0] * bins
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> shift, minlength=bins).astype(np.float64)
    return list(hist / hist.sum())


def decode_image(data: bytes) -> "np.ndarray":
    """Decode an image blob to an HxWxC array. STUB: requires PIL, which is
    not installed in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; use extract_blob_features' histogram "
            "fallback in this environment"
        ) from e
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)))


def extract_blob_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "url", bins: int = 16
) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Tries the real decoder per media kind; falls back to the deterministic
    byte histogram when the codec stack is absent. Output schema:
    (id, n_bytes, feature: array<double>) — one Arrow batch per partition
    chunk, no Python-per-row overhead.
    """
    schema = f"{id_col} string, n_bytes bigint, feature array<double>"
    shift = _bin_shift(bins)  # validate on the driver, before any job runs
    cols = df.select(F.col(id_col).cast("string"), F.col(blob_col).alias("_blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, feats = [], [], []
            for i, data in zip(pdf[id_col], pdf["_blob"]):
                data = bytes(data) if data is not None else b""
                try:
                    arr = decode_image(data)
                    # same bins-derived shift as the fallback: both paths
                    # must emit the SAME feature width or a mixed corpus
                    # (some rows decodable, some not) breaks fixed-width
                    # downstream consumers
                    hist = np.bincount(
                        (arr.ravel().astype(np.uint8)) >> shift, minlength=bins
                    ).astype(np.float64)
                    feat = list(hist / max(hist.sum(), 1.0))
                except NotImplementedError:
                    feat = _byte_histogram(data, bins)
                ids.append(i)
                sizes.append(len(data))
                feats.append(feat)
            yield pd.DataFrame({id_col: ids, "n_bytes": sizes, "feature": feats})

    return cols.mapInPandas(extract, schema)


def sample_frames(
    df: DataFrame, blob_col: str = "blob", id_col: str = "url", every_n: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing for video blobs. STUB decoder: emits one
    'frame' row per ``every_n`` bytes with a deterministic offset digest —
    the real implementation swaps the inner loop for a codec, the Spark
    shape (mapInPandas, 1→N row explosion, bounded batch memory) is final.
    """
    schema = f"{id_col} string, frame_idx bigint, offset bigint, digest string"
    cols = df.select(F.col(id_col).cast("string"), F.col(blob_col).alias("_blob"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {id_col: [], "frame_idx": [], "offset": [], "digest": []}
            for i, data in zip(pdf[id_col], pdf["_blob"]):
                data = bytes(data) if data is not None else b""
                for fi, off in enumerate(range(0, len(data), every_n)):
                    chunk = data[off : off + every_n]
                    out[id_col].append(i)
                    out["frame_idx"].append(fi)
                    out["offset"].append(off)
                    out["digest"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return cols.mapInPandas(sample, schema)
