"""Property-based tests (hypothesis) for the cuckoo URL-seen filter: a
multiset model drives random interleavings of add/delete/merge and the
filter must NEVER answer "definitely new" for a key the model still
holds — the one invariant the crawl's correctness rides on (a false
negative skips the exact anti-join: a seen URL re-crawled). The model
also pins the delete contract: deleting a key the model holds must
report removed, and draining the model must drain the filter to zero
occupancy (table + overflow).

Deliberately tiny tables (1<<4 .. 1<<8 buckets) force every regime —
eviction chains, the >0.95-load direct-spill path, overflow multiset
bookkeeping — at a few hundred keys, where the module's normal sizing
would never reach them.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.operators.cuckoo import SLOTS, CuckooFilterSet

keys64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@st.composite
def op_sequences(draw):
    """A bucket-count and a sequence of (op, keys) steps. Deletes draw
    from the live multiset (the documented contract: only delete inserted
    keys); adds may repeat keys (multiset semantics)."""
    log_nb = draw(st.integers(min_value=4, max_value=8))
    n_steps = draw(st.integers(min_value=1, max_value=8))
    steps = []
    for _ in range(n_steps):
        op = draw(st.sampled_from(["add", "add", "delete"]))
        ks = draw(st.lists(keys64, min_size=1, max_size=120))
        steps.append((op, ks))
    return 1 << log_nb, steps


def _arr(ks) -> np.ndarray:
    return np.asarray(ks, dtype=np.int64)


@settings(max_examples=150, deadline=None)
@given(op_sequences())
def test_no_false_negative_under_any_interleaving(seq):
    nb, steps = seq
    cf = CuckooFilterSet(nb)
    model: Counter = Counter()
    for op, ks in steps:
        if op == "add":
            cf.add(_arr(ks))
            model.update(ks)
        else:
            live = [k for k, c in model.items() if c > 0]
            if not live:
                continue
            # delete a prefix of the live keys (stable across shrinking)
            victims = live[: max(1, len(live) // 2)]
            removed = cf.delete(_arr(victims))
            assert removed.all(), "delete missed a key the model holds"
            for k in victims:
                model[k] -= 1
        live_keys = _arr([k for k, c in model.items() if c > 0])
        if len(live_keys):
            assert cf.maybe_contains(live_keys).all(), (
                "false negative: filter forgot a live key"
            )


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=4, max_value=7),
    st.lists(keys64, min_size=1, max_size=300),
    st.lists(keys64, min_size=1, max_size=300),
)
def test_merge_is_union_and_drainable(log_nb, a, b):
    nb = 1 << log_nb
    fa, fb = CuckooFilterSet(nb), CuckooFilterSet(nb)
    fa.add(_arr(a))
    fb.add(_arr(b))
    merged = fa.merge(fb)
    assert merged.maybe_contains(_arr(a + b)).all()
    # the merged filter holds the multiset union: deleting every inserted
    # copy (a then b) must drain it to exactly zero occupancy
    assert merged.delete(_arr(a)).all()
    assert merged.delete(_arr(b)).all()
    assert int(np.count_nonzero(merged.table)) == 0
    assert len(merged.overflow) == 0


@settings(max_examples=60, deadline=None)
@given(st.lists(keys64, min_size=1, max_size=400))
def test_bytes_roundtrip_preserves_membership_and_deletes(ks):
    cf = CuckooFilterSet(1 << 6)
    cf.add(_arr(ks))
    t, o = cf.to_bytes()
    back = CuckooFilterSet.from_bytes(cf.num_buckets, t, o)
    assert back.maybe_contains(_arr(ks)).all()
    assert back.delete(_arr(ks)).all()
    assert int(np.count_nonzero(back.table)) == 0 and len(back.overflow) == 0
