"""URL-seen set, cuckoo-filter backend: partitioned build + exact anti-join.

The north rule names "partitioned bloom/cuckoo URL-seen filters
(broadcast-merged per iteration)"; ``operators/seen.py`` is the bloom
backend, this module is the cuckoo one (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14). Same contract as the bloom —
a compact approximate-membership pre-filter with NO false negatives, so
the exact LEFT ANTI JOIN stays the ground truth and the filter only
decides which candidates may skip the join shuffle — plus the property
blooms cannot offer: DELETION. A crawl that re-visits URLs on a TTL
(recrawl scheduling) can expire entries from the seen filter in place
instead of rebuilding it from the seen table.

Design, mirroring ``seen.py``:

- keys are 64-bit ``xxhash64`` values computed JVM-side; Python only sees
  int64 batches through Arrow;
- per-partition filters are built in ``mapInPandas`` (numpy uint16 bucket
  tables), tree-merged executor-side within ``merge_fanin`` groups, and
  the driver merges at most ``merge_fanin`` tables — the same
  driver-traffic bound as the bloom build;
- the probe is a broadcast table + vectorized ``pandas_udf``.

Layout: ``num_buckets`` (power of two) buckets × 4 slots of 16-bit
fingerprints, fingerprint 0 reserved as "empty". A key's two candidate
buckets are ``i1 = h & (nb-1)`` and ``i2 = i1 XOR mix(fp)`` — the XOR
form makes the alternate computable from (bucket, fp) alone, which is
what lets two filters MERGE: every stored pair re-inserts into the
union filter without knowing its original key. Inserts that exhaust the
eviction budget spill the evicted pair into an exact ``overflow`` array
(membership checks consult it), so the no-false-negative invariant holds
unconditionally — a mis-sized filter degrades to a slightly larger probe
cost, never to a seen URL re-crawled past the filter. At 2^19 buckets ×
4 slots the table is 4 MiB and holds ~2M keys at the 0.95 load factor;
sizing per expected cardinality is the caller's dial exactly as
``bloom_bits`` is (10^10 URLs ⇒ shard per partition range, as seen.py's
module docstring lays out for the bloom).

False-positive rate ≈ 2·SLOTS/2^16 ≈ 1.2e-4 — ~80× tighter than the
default bloom config at comparable memory, the paper's headline trade.
Deletion caveat (also the paper's): only delete keys that were inserted;
deleting an absent key can evict a colliding (bucket, fp) twin. The
crawl's seen set inserts each normalized URL exactly once, so TTL expiry
over previously-seen URLs is sound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SLOTS = 4
_EMPTY = np.uint16(0)
# golden-ratio multiplicative mix of the fingerprint → alternate-bucket
# offset; >>32 keeps the mixed bits independent of the low index bits
_MIX = np.uint64(0x9E3779B97F4A7C15)
# eviction-chain budget before an insert spills to the exact overflow
# array; 500 is the paper's figure — at sane load factors chains this
# long essentially never happen
_MAX_KICKS = 500
# the paper's high-watermark load factor for 4-slot buckets; past it
# eviction chains blow up and inserts start spilling to the exact overflow
SAFE_LOAD = 0.84


class CuckooFilterSet:
    """Fixed-size partial-key cuckoo filter over int64 keys."""

    def __init__(
        self,
        num_buckets: int = 1 << 19,
        table: np.ndarray | None = None,
        overflow: np.ndarray | None = None,
    ):
        assert num_buckets >= 2 and (num_buckets & (num_buckets - 1)) == 0, (
            "num_buckets must be a power of two (the XOR alternate-bucket "
            "derivation requires it)"
        )
        self.num_buckets = num_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((num_buckets, SLOTS), dtype=np.uint16)
        )
        # exact spill of eviction-budget-exhausted pairs, packed
        # (bucket << 16) | fp as uint64 — consulted by maybe_contains
        self.overflow = (
            overflow if overflow is not None else np.zeros(0, dtype=np.uint64)
        )

    # -- key → (bucket, fingerprint) -----------------------------------------

    def _index_fp(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.asarray(hashes).astype(np.int64).view(np.uint64)
        fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == _EMPTY, np.uint16(1), fp)  # 0 is the empty marker
        i1 = (h & np.uint64(self.num_buckets - 1)).astype(np.int64)
        return i1, fp

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mixed = (fp.astype(np.uint64) * _MIX) >> np.uint64(32)
        return (
            (idx.astype(np.uint64) ^ mixed) & np.uint64(self.num_buckets - 1)
        ).astype(np.int64)

    @staticmethod
    def _pack(idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (idx.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)

    # -- vectorized batch placement ------------------------------------------

    def _place(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Place each (bucket, fp) pair into a free slot of its bucket where
        one exists, resolving intra-batch contention by rank-within-bucket
        (stable sort), so no two pairs claim the same slot. Returns the
        placed mask, aligned to the input order."""
        n = len(idx)
        if n == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(idx, kind="stable")
        si, sf = idx[order], fp[order]
        uniq, start, counts = np.unique(si, return_index=True, return_counts=True)
        rank = np.arange(n) - np.repeat(start, counts)
        free = self.table[uniq] == _EMPTY  # (U, SLOTS)
        nfree = free.sum(axis=1)
        can = rank < np.repeat(nfree, counts)
        # the rank-th free slot of each bucket: argsort puts free slot
        # indices first (stable, so in slot order)
        slot_order = np.argsort(~free, axis=1, kind="stable")
        slots = slot_order[
            np.repeat(np.arange(len(uniq)), counts),
            np.minimum(rank, SLOTS - 1),  # clamped; only read where can=True
        ]
        self.table[si[can], slots[can]] = sf[can]
        placed = np.zeros(n, dtype=bool)
        placed[order] = can
        return placed

    def _insert_kick(self, idx: int, fp: int) -> None:
        """Scalar eviction-chain insert for pairs both of whose buckets are
        full — the slow path; at sane load factors a vanishing fraction of
        inserts land here. Deterministic victim choice (kick % SLOTS) keeps
        builds reproducible."""
        cur_i, cur_f = int(idx), np.uint16(fp)
        for kick in range(_MAX_KICKS):
            row = self.table[cur_i]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur_f
                return
            s = kick % SLOTS
            victim = row[s]
            row[s] = cur_f
            cur_f = victim
            cur_i = int(
                self._alt(np.array([cur_i]), np.array([victim], np.uint16))[0]
            )
        self.overflow = np.append(
            self.overflow, self._pack(np.array([cur_i]), np.array([cur_f]))
        )

    def _insert_pairs(self, idx: np.ndarray, fp: np.ndarray) -> None:
        """Insert raw (bucket, fp) pairs: vectorized home-bucket pass, then
        vectorized alternate-bucket pass, then the scalar kick loop for the
        few pairs both of whose buckets were full. On an observably
        saturated table (load > 0.95, well past SAFE_LOAD) the kick chase
        would exhaust its 500-eviction budget for almost every pair only
        to spill anyway — ~4 ms of interpreter time per key — so the
        remainder spills straight to the exact overflow in one
        concatenate: identical membership/delete/merge semantics (the
        overflow is consulted everywhere), just without burning the
        eviction budget on a table that cannot absorb the keys."""
        placed = self._place(idx, fp)
        rem_i, rem_f = idx[~placed], fp[~placed]
        if len(rem_i) == 0:
            return
        alt = self._alt(rem_i, rem_f)
        placed2 = self._place(alt, rem_f)
        rem3_i, rem3_f = rem_i[~placed2], rem_f[~placed2]
        if len(rem3_i) == 0:
            return
        if self.load_factor() > 0.95:
            self.overflow = np.concatenate(
                [self.overflow, self._pack(rem3_i, rem3_f)]
            )
            return
        for i, f in zip(rem3_i, rem3_f):
            self._insert_kick(int(i), int(f))

    # -- public set operations ------------------------------------------------

    def add(self, hashes: np.ndarray) -> None:
        i1, fp = self._index_fp(np.asarray(hashes))
        self._insert_pairs(i1, fp)

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        i1, fp = self._index_fp(np.asarray(hashes))
        if len(i1) == 0:
            return np.zeros(0, dtype=bool)
        i2 = self._alt(i1, fp)
        out = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if len(self.overflow):
            out |= np.isin(self._pack(i1, fp), self.overflow) | np.isin(
                self._pack(i2, fp), self.overflow
            )
        return out

    def _unplace(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized inverse of ``_place``: clear ONE stored copy of each
        (bucket, fp) pair where one exists. Intra-batch multiset contention
        resolves by rank-within-(bucket, fp)-group exactly as ``_place``
        ranks within buckets — the rank-th requester claims the rank-th
        matching slot, so k requests against m stored copies clear
        min(k, m) slots, never the same slot twice. Returns the cleared
        mask aligned to input order."""
        n = len(idx)
        if n == 0:
            return np.zeros(0, dtype=bool)
        packed = self._pack(idx, fp)
        order = np.argsort(packed, kind="stable")
        sp = packed[order]
        uniq, start, counts = np.unique(sp, return_index=True, return_counts=True)
        rank = np.arange(n) - np.repeat(start, counts)
        ui = (uniq >> np.uint64(16)).astype(np.int64)
        uf = (uniq & np.uint64(0xFFFF)).astype(np.uint16)
        match = self.table[ui] == uf[:, None]  # (U, SLOTS)
        nmatch = match.sum(axis=1)
        can = rank < np.repeat(nmatch, counts)
        # the rank-th matching slot of each pair's bucket (argsort puts
        # matching slot indices first, stable ⇒ in slot order); distinct
        # ranks within a group ⇒ distinct slots, and distinct fp groups in
        # one bucket match disjoint slots, so the scatter never collides
        slot_order = np.argsort(~match, axis=1, kind="stable")
        slots = slot_order[
            np.repeat(np.arange(len(uniq)), counts),
            np.minimum(rank, SLOTS - 1),  # clamped; only read where can=True
        ]
        si = np.repeat(ui, counts)
        self.table[si[can], slots[can]] = _EMPTY
        removed = np.zeros(n, dtype=bool)
        removed[order] = can
        return removed

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy per key (bloom filters cannot do this —
        the operation that justifies the cuckoo backend: TTL/recrawl expiry
        of seen URLs without rebuilding the filter). Only sound for keys
        that were inserted; returns the per-key removed mask.

        Vectorized mirror of the insert path: a bulk home-bucket pass, a
        bulk alternate-bucket pass for the misses, then a scalar walk of
        the exact overflow spill for the (rare) remainder — interpreter
        time is O(overflow hits), not O(keys), so a 10M-URL TTL expiry is
        numpy-bound."""
        i1, fp = self._index_fp(np.asarray(hashes))
        n = len(i1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        removed = self._unplace(i1, fp)
        miss = ~removed
        if miss.any():
            hit2 = self._unplace(self._alt(i1[miss], fp[miss]), fp[miss])
            removed[np.nonzero(miss)[0][hit2]] = True
        miss = ~removed
        if miss.any() and len(self.overflow):
            # MULTISET semantics for the overflow: two distinct keys can
            # spill identical (bucket, fp) pairs — a set would collapse
            # them and the second delete would miss its copy
            from collections import Counter

            ov = Counter(self.overflow.tolist())
            ov_changed = False
            mi = np.nonzero(miss)[0]
            p1 = self._pack(i1[mi], fp[mi])
            p2 = self._pack(self._alt(i1[mi], fp[mi]), fp[mi])
            for k, a, b in zip(mi, p1.tolist(), p2.tolist()):
                for packed in (a, b):
                    if ov.get(packed, 0) > 0:
                        ov[packed] -= 1
                        ov_changed = True
                        removed[k] = True
                        break
            if ov_changed:
                self.overflow = np.fromiter(
                    (p for p, c in ov.items() for _ in range(c)),
                    dtype=np.uint64,
                )
        return removed

    def load_factor(self) -> float:
        """Occupied fraction of the slot table (overflow spills count as
        occupancy — they exist precisely because the table was full).
        One 4 MiB ``count_nonzero`` scan; cheap enough per iteration."""
        return (int(np.count_nonzero(self.table)) + len(self.overflow)) / (
            self.num_buckets * SLOTS
        )

    def needs_grow(self) -> bool:
        """True past the paper's 0.84 high-watermark for 4-slot buckets —
        beyond it eviction chains (and thus overflow spills and scalar-
        kick insert time) blow up, so incremental maintainers (the crawl
        loop) should rebuild at ``buckets_for`` the larger cardinality
        instead of merging into a saturated table."""
        return self.load_factor() > SAFE_LOAD

    def merge(self, other: "CuckooFilterSet") -> "CuckooFilterSet":
        """Union by re-inserting every stored pair of ``other`` — possible
        precisely because the alternate bucket is derivable from
        (bucket, fp) alone. Duplicate pairs are kept (not collapsed), so
        post-merge deletion of one key never erases a colliding twin."""
        assert self.num_buckets == other.num_buckets
        out = CuckooFilterSet(
            self.num_buckets, table=self.table.copy(), overflow=self.overflow.copy()
        )
        bi, _si = np.nonzero(other.table)
        out._insert_pairs(bi.astype(np.int64), other.table[bi, _si])
        if len(other.overflow):
            out._insert_pairs(
                (other.overflow >> np.uint64(16)).astype(np.int64),
                (other.overflow & np.uint64(0xFFFF)).astype(np.uint16),
            )
        return out

    # -- (de)serialization for Arrow transport --------------------------------

    def to_bytes(self) -> tuple[bytes, bytes]:
        return self.table.tobytes(), self.overflow.tobytes()

    @classmethod
    def from_bytes(
        cls, num_buckets: int, table: bytes, overflow: bytes, copy: bool = True
    ) -> "CuckooFilterSet":
        """``copy=False`` returns a read-only view — frombuffer arrays are
        immutable, fine for probing (``maybe_contains``) and a 4 MiB/batch
        saving in the probe UDF; mutating paths (merge) need the copy."""
        t = np.frombuffer(table, dtype=np.uint16).reshape(num_buckets, SLOTS)
        o = np.frombuffer(overflow, dtype=np.uint64)
        if copy:
            t, o = t.copy(), o.copy()
        return cls(num_buckets, table=t, overflow=o)


def buckets_for(expected_n: int, load_factor: float = SAFE_LOAD) -> int:
    """Smallest power-of-two bucket count holding ``expected_n`` keys at
    ``load_factor`` (default ``SAFE_LOAD`` = 0.84, the paper's
    high-watermark for 4-slot buckets; beyond it eviction chains blow
    up)."""
    need = max(1, int(expected_n / (SLOTS * load_factor)))
    return max(1 << 10, 1 << (need - 1).bit_length())


# same executor-side fan-in bound as the bloom build (seen.py) — the
# driver never collects more than this many serialized tables
CUCKOO_MERGE_FANIN = 32


def build_cuckoo(
    df: DataFrame,
    key: str = "url_norm",
    num_buckets: int = 1 << 19,
    merge_fanin: int = CUCKOO_MERGE_FANIN,
    hash_col: str | None = None,
) -> CuckooFilterSet:
    """Distributed build over the shared ``build_filter_distributed``
    protocol (seen.py — one code path for both backends): per-partition
    cuckoo tables, executor tree-merge, bounded driver fan-in. Merge =
    re-insert stored pairs; associative up to slot placement, and
    membership — the only consumed property — is placement-independent."""
    from crawl4ai_spark.operators.seen import build_filter_distributed

    def to_pdf(cf: CuckooFilterSet) -> pd.DataFrame:
        t, o = cf.to_bytes()
        return pd.DataFrame({"table": [t], "overflow": [o]})

    return build_filter_distributed(
        df,
        key,
        hash_col,
        new_filter=lambda: CuckooFilterSet(num_buckets),
        to_pdf=to_pdf,
        from_row=lambda row: CuckooFilterSet.from_bytes(
            num_buckets, row.table, row.overflow
        ),
        schema="table binary, overflow binary",
        merge_fanin=merge_fanin,
    )


def cuckoo_maybe_contains_col(
    spark, cf: CuckooFilterSet, key: Column, state_bc=None
) -> Column:
    """Column: True when the filter MAY contain xxhash64(key) — same probe
    contract as ``bloom_maybe_contains_col``, including the broadcast
    lifetime rule: per-iteration callers (the crawl loop) must own
    ``state_bc`` (a broadcast of ``cf.to_bytes()``) and destroy it after
    the iteration commits, or dead tables accumulate on every executor."""
    if state_bc is None:
        state_bc = spark.sparkContext.broadcast(cf.to_bytes())
    num_buckets = cf.num_buckets

    @F.pandas_udf(T.BooleanType())
    def _maybe(h: pd.Series) -> pd.Series:
        t, o = state_bc.value
        f = CuckooFilterSet.from_bytes(num_buckets, t, o, copy=False)
        return pd.Series(f.maybe_contains(h.to_numpy()), dtype="bool")

    return _maybe(F.xxhash64(key))
