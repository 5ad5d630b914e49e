"""robots.txt gating (SURVEY.md §2.4 J4 / §2.7 P5).

The reference parses robots bodies with urllib.robotparser behind a SQLite
cache and FAILS OPEN — missing or unfetchable robots means allow
(behavioral spec: utils.py:313-365, fail-open :348-352; the gate itself:
async_webcrawler.py:318-331 — denied URLs become synthetic 403 results and
are neither retried nor re-enqueued).

Spark restatement: robots is a small per-host table (hosts ≪ URLs) —
broadcast-join it to the frontier on host, then evaluate ``can_fetch`` in an
Arrow pandas UDF that parses each distinct rules text once per batch.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(rules: pd.Series, url: pd.Series) -> pd.Series:
    """True when the URL may be fetched under the given robots rules.
    Null/empty rules → allow (fail-open). Parser instances are cached per
    distinct rules text within the Arrow batch."""
    cache: dict[str, RobotFileParser] = {}
    out = []
    for r, u in zip(rules, url):
        if r is None or not str(r).strip():
            out.append(True)
            continue
        r = str(r)
        rp = cache.get(r)
        if rp is None:
            rp = RobotFileParser()
            try:
                rp.parse(r.splitlines())
            except Exception:
                out.append(True)  # unparseable → fail-open
                continue
            cache[r] = rp
        try:
            out.append(bool(rp.can_fetch("*", u)))
        except Exception:
            out.append(True)
    return pd.Series(out, dtype="bool")


def apply_robots_gate(
    frontier: DataFrame, robots: DataFrame, host: str = "host"
) -> DataFrame:
    """frontier(host, url, ...) ⟕ robots(host, rules) → + ``robots_allowed``
    boolean column. Missing host row ⇒ allowed (fail-open). The robots side
    is broadcast — it is at most one row per host."""
    joined = frontier.join(
        F.broadcast(robots.select(host, "rules")), on=host, how="left"
    )
    return joined.withColumn(
        "robots_allowed",
        F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
            robots_allowed_udf(F.col("rules"), F.col("url"))
        ),
    ).drop("rules")
