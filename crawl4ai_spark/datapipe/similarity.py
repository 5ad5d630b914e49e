"""Similarity search over an embedding column (array<float>).

Two plans, same semantics:

- brute-force: broadcast the (small) query set, cross-score every corpus
  vector with Catalyst array expressions, per-query top-k window. At 100 TB
  this is one scan, no shuffle on the corpus side — the right baseline when
  the query set is small.
- LSH (random hyperplanes): deterministic signed projections bucket the
  corpus; queries probe only their bucket. The bucket join is a hash
  equi-join on an int key — the scale path when queries are many. Buckets
  are precomputable/bucketable (write once, reuse per query batch).

All arithmetic is double-precision with a final round(6) so results are
value-identical in the DuckDB oracle. Hyperplanes derive from md5 (see
``hyperplanes``) so both engines (and any future run) see the same planes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a (possibly single-file) corpus across all cores before
    a CPU-bound per-row scoring stage — higher-order array expressions are
    interpreted (not codegen'd), so partition count IS the parallelism."""
    sc = df.sparkSession.sparkContext
    n = max(df.rdd.getNumPartitions(), sc.defaultParallelism)
    return df.repartition(n)


def dot_col(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product (order fixed ⇒ bit-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two float vectors, rounded to 6 dp."""
    ad, bd = _as_double(a), _as_double(b)
    denom = norm_col(ad) * norm_col(bd)
    return F.round(F.when(denom > 0, dot_col(ad, bd) / denom).otherwise(F.lit(0.0)), 6)


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query top-k cosine neighbors (self excluded when ids collide).
    The query side is broadcast — the corpus never shuffles."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    c = _spread(corpus).select(F.col(id_col), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col)).withColumn(
        "cosine", cosine_col(F.col("_qvec"), F.col("_cvec"))
    )
    # shed the vector columns BEFORE the window shuffle: the rank only
    # needs (query_id, id, cosine) — shuffling 64-float arrays per row
    # would double the exchange size for nothing
    scored = scored.select(query_id_col, id_col, "cosine")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rank").cast("long").alias("rank"))
    )


# -- deterministic random hyperplanes ----------------------------------------


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component c of plane p is
    (md5int("hp{p}:{c}") mod 2001 − 1000)/1000 ∈ [−1, 1]. Pure function of
    (p, c) — identical in Python, Spark SQL and DuckDB, so LSH bucketing is
    reproducible everywhere."""
    planes = []
    for p in range(num_planes):
        row = []
        for c in range(dim):
            h = int(hashlib.md5(f"hp{p}:{c}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-projection bucket id: bit p set ⇔ dot(vec, plane_p) > 0."""
    vd = _as_double(vec)
    acc = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit = F.array(*[F.lit(v) for v in plane])
        proj = dot_col(vd, lit)
        acc = acc + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane bucket.
    Recall < 1 by construction (that's the trade); the bucket join is a
    uniform int-key equi-join, the scale path for large query sets."""
    c = _spread(corpus).select(
        F.col(id_col),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = c.join(F.broadcast(q), on="_bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    ).withColumn("cosine", cosine_col(F.col("_qvec"), F.col("_cvec")))
    # shed the vector columns BEFORE the window shuffle: the rank only
    # needs (query_id, id, cosine) — shuffling 64-float arrays per row
    # would double the exchange size for nothing
    scored = scored.select(query_id_col, id_col, "cosine")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", F.col("rank").cast("long").alias("rank"))
    )


def embedding_dedup_pairs(
    df: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) among LSH-bucket cohabitants — the vector twin of
    minhash_dedup_pairs, with the same candidate-then-verify shape."""
    base = _spread(df).select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), planes).alias("_bucket"),
    ).cache()
    a, b = base.alias("a"), base.alias("b")
    cand = a.join(
        b,
        (F.col("a._bucket") == F.col("b._bucket"))
        & (F.col("a.vid") < F.col("b.vid")),
    )
    return (
        cand.withColumn("cosine", cosine_col(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
