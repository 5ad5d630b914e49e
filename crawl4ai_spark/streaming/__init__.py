"""Stateful Structured-Streaming operators.

The batch crawl loop evolves per-host politeness state once per frontier
iteration (``operators.politeness.evolve_host_state``, committed as the
host_state snapshot). This package re-expresses that evolution as
Structured Streaming stateful operators over the crawl's live result
stream (``SnapshotTable.stream``), using ``applyInPandasWithState`` so
per-host state lives in Spark's streaming state store — partitioned by
host across executors, surviving micro-batch boundaries and restarts via
the checkpoint location.
"""

from crawl4ai_spark.streaming.hoststate import stream_host_state

__all__ = ["stream_host_state"]
