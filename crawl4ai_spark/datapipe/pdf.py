"""PDF blob processing (reference surface: processors/pdf/processor.py —
NaivePDFProcessorStrategy.process :75-123 per-page loop, _process_page
:204-233 text extraction, _extract_links :403-413 URI annotations,
_extract_metadata :415-438 Info dict; processors/pdf/__init__.py
PDFContentScrapingStrategy wiring).

Spark shape: PDFs ride as opaque ``binary`` columns (the multimodal
convention); page extraction is a ``mapInPandas`` 1→N explosion — one Arrow
batch in, one row per page out, shuffle-free. The real decoder is pypdf,
gated behind a try-import like the image codec (multimodal.decode_image);
this container has no pypdf, so the shipped path is a from-scratch naive
parser over UNCOMPRESSED content streams:

- a page = one ``stream``…``endstream`` content block, in byte order (the
  naive stand-in for pypdf's page tree walk);
- page text = the ``(...)`` strings shown by ``Tj`` operators (joined with
  single spaces) and inside ``[...] TJ`` arrays (concatenated — kerning
  numbers ignored), BT…ET blocks joined with newlines; octal-free escapes
  ``\\(`` ``\\)`` ``\\\\`` are unescaped;
- page links = ``/URI (...)`` annotation values, in order (the reference's
  _extract_links reads the same annotation dictionaries via pypdf);
- document metadata = ``/Title`` ``/Author`` ``/Subject`` ``/Producer``
  literal-string values from the Info dictionary region, last wins (pypdf
  reads the trailer's Info ref; a linearized file can carry two copies and
  the updated one is last).

Compressed (``/FlateDecode``) streams require the real decoder and yield
empty text under the naive parser — documented, like every codec-absent
stub in datapipe.multimodal.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PDF_MAGIC = b"%PDF"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# literal string with \-escapes kept opaque until unescaping
_STR = rb"\(((?:[^()\\]|\\.)*)\)"
_TJ_RE = re.compile(_STR + rb"\s*Tj")
_TJARR_RE = re.compile(rb"\[((?:[^\]\\]|\\.)*)\]\s*TJ")
_URI_RE = re.compile(rb"/URI\s*" + _STR)
_META_KEYS = ("Title", "Author", "Subject", "Producer")


def _unescape(raw: bytes) -> str:
    out = re.sub(rb"\\([()\\])", rb"\1", raw)
    return out.decode("latin-1")


def _block_text(block: bytes) -> str:
    """Text shown inside one BT…ET block: Tj strings joined with spaces,
    TJ array strings concatenated in place of their Tj-level slot."""
    parts: list[str] = []
    # walk Tj and TJ operators in order of appearance
    for m in re.finditer(_STR + rb"\s*Tj|\[((?:[^\]\\]|\\.)*)\]\s*TJ", block):
        if m.group(1) is not None:
            parts.append(_unescape(m.group(1)))
        else:
            arr = m.group(2)
            parts.append("".join(_unescape(s.group(1)) for s in re.finditer(_STR, arr)))
    return " ".join(p for p in parts if p)


def parse_pdf_pages(data: bytes) -> list[dict]:
    """Naive per-page parse: [{page_number, text, links}] (1-based, the
    reference's page numbering, processor.py:85)."""
    if not data.startswith(PDF_MAGIC):
        return []
    pages = []
    for i, m in enumerate(_STREAM_RE.finditer(data)):
        content = m.group(1)
        text = "\n".join(
            t for t in (_block_text(b.group(1)) for b in _BT_RE.finditer(content)) if t
        )
        links = [_unescape(u.group(1)) for u in _URI_RE.finditer(content)]
        pages.append({"page_number": i + 1, "text": text, "links": links})
    return pages


def parse_pdf_metadata(data: bytes) -> dict:
    """Info-dict literal strings (title/author/subject/producer), last
    occurrence wins; '' when absent. Mirrors _extract_metadata's field set
    minus the date parsing (no /CreationDate in the naive surface)."""
    meta = {k.lower(): "" for k in _META_KEYS}
    if not data.startswith(PDF_MAGIC):
        return meta
    for k in _META_KEYS:
        hits = re.findall(rb"/" + k.encode() + rb"\s*" + _STR, data)
        if hits:
            meta[k.lower()] = _unescape(hits[-1])
    return meta


def extract_pdf_pages(
    df: DataFrame, blob_col: str = "blob", id_col: str = "url"
) -> DataFrame:
    """mapInPandas 1→N page extraction: (id, page_number, text, n_links,
    links array). Tries pypdf per document; the naive parser is the
    codec-absent fallback (same pattern as multimodal.extract_blob_features
    — in an environment with pypdf installed the real decoder wins)."""
    schema = (
        f"{id_col} string, page_number bigint, text string, "
        "n_links bigint, links array<string>"
    )
    cols = df.select(F.col(id_col).cast("string"), F.col(blob_col).alias("_blob"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out: dict[str, list] = {
                id_col: [], "page_number": [], "text": [], "n_links": [], "links": []
            }
            for i, data in zip(pdf_batch[id_col], pdf_batch["_blob"]):
                data = bytes(data) if data is not None else b""
                try:
                    pages = _pypdf_pages(data)
                except NotImplementedError:
                    pages = parse_pdf_pages(data)
                for p in pages:
                    out[id_col].append(i)
                    out["page_number"].append(p["page_number"])
                    out["text"].append(p["text"])
                    out["n_links"].append(len(p["links"]))
                    out["links"].append(p["links"])
            # explicit dtypes: a batch whose PDFs all fail the magic check
            # yields zero rows, and pandas would infer float64 for the empty
            # list column — which Arrow cannot convert to array<string>
            yield pd.DataFrame({
                id_col: pd.Series(out[id_col], dtype=object),
                "page_number": pd.Series(out["page_number"], dtype="int64"),
                "text": pd.Series(out["text"], dtype=object),
                "n_links": pd.Series(out["n_links"], dtype="int64"),
                "links": pd.Series(out["links"], dtype=object),
            })

    return cols.mapInPandas(extract, schema)


def _pypdf_pages(data: bytes) -> list[dict]:
    """Real decoder path (processor.py:75-123). STUB: requires pypdf, not
    installed in this container."""
    try:
        import pypdf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pdf decode requires pypdf; extract_pdf_pages falls back to the "
            "naive uncompressed-stream parser in this environment"
        ) from e
    import io

    from pypdf import PdfReader

    reader = PdfReader(io.BytesIO(data))
    pages = []
    for i, page in enumerate(reader.pages):
        links = []
        for annot in page.get("/Annots") or []:
            obj = annot.get_object()
            uri = obj.get("/A", {}).get("/URI")
            if uri:
                links.append(str(uri))
        pages.append(
            {"page_number": i + 1, "text": page.extract_text() or "", "links": links}
        )
    return pages


def pdf_doc_summary(
    df: DataFrame, blob_col: str = "blob", id_col: str = "url"
) -> DataFrame:
    """One row per document: page count, ordered per-page text digests,
    total link count, and the Info-dict title — the per-page explosion
    re-aggregated so composite joins stay 1:1 on the id."""
    pages = extract_pdf_pages(df, blob_col, id_col)
    agg = (
        pages.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page_number", F.md5(F.col("text")).alias("d")))
                    ),
                    lambda s: s["d"],
                ),
                "|",
            ).alias("page_digests"),
            F.sum("n_links").alias("total_links"),
        )
    )
    meta_schema = f"{id_col} string, pdf_title string, is_pdf boolean"
    cols = df.select(F.col(id_col).cast("string"), F.col(blob_col).alias("_blob"))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, titles, flags = [], [], []
            for i, data in zip(b[id_col], b["_blob"]):
                data = bytes(data) if data is not None else b""
                ids.append(i)
                titles.append(parse_pdf_metadata(data)["title"])
                flags.append(data.startswith(PDF_MAGIC))
            yield pd.DataFrame({id_col: ids, "pdf_title": titles, "is_pdf": flags})

    metas = cols.mapInPandas(meta, meta_schema)
    # left join keeps not-a-pdf rows (0 pages) visible with is_pdf=false
    return metas.join(agg, id_col, "left").select(
        id_col,
        "is_pdf",
        F.coalesce("n_pages", F.lit(0)).cast("long").alias("n_pages"),
        F.coalesce("page_digests", F.lit("")).alias("page_digests"),
        F.coalesce("total_links", F.lit(0)).cast("long").alias("total_links"),
        "pdf_title",
    )
