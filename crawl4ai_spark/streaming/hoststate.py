"""Streaming per-host politeness state via applyInPandasWithState.

Same deterministic RateLimiter variant as the batch operator (spec:
reference async_dispatcher.py:63-83 — any 429/503 on the host in an
iteration → delay = min(delay·2, max_delay); all success → delay =
max(base_delay, delay·0.75); fail_count accumulates/resets; see
``operators.politeness.evolve_host_state``). The streaming form applies
one evolution step per (host, iteration) group as result rows arrive, so
the state after iteration k is IDENTICAL to folding the batch operator k
times — pinned differentially in tests/test_streaming_state.py.

Scale shape: ``applyInPandasWithState`` hash-partitions groups by host
across executors and keeps state in the streaming state store (RocksDB
on a real cluster), so 10⁸ hosts are a partitioned key-value state, not
a driver-side structure; each micro-batch only touches hosts with new
rows. Restart-safety comes from the query's checkpointLocation — the
state store recovers and evolution continues from the committed delays.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    from typing import Any

OUTPUT_SCHEMA = (
    "host string, iteration bigint, current_delay double, "
    "fail_count int, last_iter bigint"
)
# done_iter: highest iteration id already folded into the state — the
# idempotence guard against an iteration's files splitting across
# micro-batches (see stream_host_state docstring). NB state-store schema:
# a checkpoint written under an OLDER schema cannot resume under a new
# one (Spark's state store does not migrate rows) — changing this schema
# requires a fresh checkpointLocation, discarding accumulated host state;
# version the checkpoint directory alongside the library when upgrading.
STATE_SCHEMA = (
    "current_delay double, fail_count int, last_iter bigint, done_iter bigint"
)


def stream_host_state(
    results: DataFrame,
    base_delay: float = 0.5,
    max_delay: float = 60.0,
    host_col: str = "host",
    iteration_col: str = "iteration",
    status_col: str = "status_code",
) -> DataFrame:
    """Stateful stream transform: crawl result rows in, one audit row per
    (host, iteration) state transition out (append mode).

    ``results`` is a STREAMING DataFrame of crawl results carrying
    (host, iteration, status_code) — e.g. ``SnapshotTable.stream`` over
    the results table. First sight of a host initialises it at
    (base_delay, fail_count=0, last_iter=iteration), exactly like the
    batch loop's first-seen default, and the iteration that revealed it
    evolves that default in the same step. Iterations are processed in
    ascending order within each micro-batch; snapshot appends arrive in
    commit order under the file source, so a host's iterations are seen
    in order end-to-end (out-of-order delivery would evolve in arrival
    order — the same at-least-once caveat as any streaming fold).

    Idempotence guard: the state remembers the highest iteration already
    folded (``done_iter``) and SKIPS any re-arriving iteration, so an
    iteration whose files split across micro-batches (a caller setting
    ``maxFilesPerTrigger``; the file source's default delivers every
    committed file of a batch together) evolves the state ONCE — first
    fragment wins — instead of double-doubling the delay and emitting
    duplicate (host, iteration) audit rows. The residual caveat is the
    dual: a 429 that only appears in a later fragment of the same split
    iteration is not re-folded. Pace by whole snapshot commits when exact
    batch-fold equivalence matters.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            delay, fails, last, done = state.get
        else:
            delay, fails, last, done = None, 0, None, -(1 << 62)
        rows: list[tuple] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        for it, grp in batch.sort_values(iteration_col).groupby(
            iteration_col, sort=True
        ):
            if int(it) <= done:
                continue  # replayed / split-batch fragment: already folded
            if delay is None:
                delay, fails, last = float(base_delay), 0, int(it)
            throttled = int(grp[status_col].isin([429, 503]).sum())
            if throttled > 0:
                delay = min(delay * 2.0, max_delay)
                fails += 1
            else:
                delay = max(delay * 0.75, base_delay)
                fails = 0
            last = int(last) + 1
            done = int(it)
            rows.append((host, int(it), float(delay), int(fails), int(last)))
        if rows:
            state.update((float(delay), int(fails), int(last), int(done)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "iteration", "current_delay", "fail_count", "last_iter"
                ],
            )

    narrowed = results.select(
        results[host_col].alias("host"),
        results[iteration_col].cast("long").alias(iteration_col),
        results[status_col].alias(status_col),
    )
    return narrowed.groupBy("host").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
