"""Local stand-in for the driver's correctness gate: run every contract
query on Spark at sf0.01 and its oracle on DuckDB, compare values exactly.

Usage: python tools/check_contract.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    from crawl4ai_spark.contract import ORACLES, QUERIES
    from crawl4ai_spark.session import get_spark

    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        status = None
        if list(cs.columns) != list(co.columns):
            status = f"column mismatch: spark={list(cs.columns)} oracle={list(co.columns)}"
        elif len(cs) != len(co):
            status = f"row count: spark={len(cs)} oracle={len(co)}"
        elif not cs.equals(co):
            diff_cols = [c for c in cs.columns if not cs[c].equals(co[c])]
            neq = (cs[diff_cols[0]] != co[diff_cols[0]])
            i = int(neq.idxmax())
            status = (
                f"values differ in {diff_cols}; first at row {i}: "
                f"spark={cs.iloc[i].to_dict()} oracle={co.iloc[i].to_dict()}"
            )
        if status:
            print(f"FAIL  {name}: {status}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(cs)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
