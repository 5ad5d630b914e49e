"""Embedding-based adaptive crawl strategy kernels (SURVEY.md §2.5 A8).

Spark restatement of the reference EmbeddingStrategy (behavioral spec:
/root/reference/crawl4ai/adaptive_crawler.py — distance matrix :622-646,
find_coverage_gaps :774-802, select_links_for_expansion :804-921,
calculate_confidence :924-951, validate_coverage :1055-1090, should_stop
:1091-1140, get_quality_confidence :1142-1167, update_state dedup
:1169-1228).

The reference holds the whole knowledge base as an in-memory numpy matrix
and recomputes a Q×KB distance matrix per iteration. The Spark shape keeps
the KB as a DataFrame and expresses every matrix product as ONE corpus scan
with the tiny side broadcast:

- ``best_similarity_per_query``: queries (≤ tens of rows) broadcast-cross
  the KB; ``max`` groupBy on query_id — the only shuffle carries Q rows.
- ``select_links_for_expansion``: candidate links (one frontier batch)
  broadcast against the gap set (≤ Q rows) for the gap-improvement sum, and
  broadcast against the KB scan for the overlap penalty — the KB is scanned
  once, never shuffled.
- ``kb_admit_new``: the new batch broadcast against the KB scan; max-sim
  per new doc via groupBy on the (small) batch key.

At 100 TB of KB none of these move the corpus; they are all
broadcast-nested-loop scans with Q-row or batch-row aggregations.

Documented divergences from the reference:
- cosine uses plain dot/(|a|·|b|) (the shared ``cosine_col`` kernel, which
  the DuckDB oracles match bit-for-round); the reference adds a 1e-8 norm
  epsilon in ``calculate_confidence`` only — identical except on
  all-zero vectors.
- the LLM query-expansion call is stubbed IN THE REFERENCE ITSELF
  (adaptive_crawler.py:686-698: the completion is commented out and a mock
  list is used); here the variations are an explicit argument and the
  train/validation split is deterministic (last ``n_validation`` rows)
  where the reference shuffles with unseeded ``random.shuffle``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.similarity import cosine_col

# reference defaults (adaptive_crawler.py:804-921, :1091-1140, :1142-1167)
COVERAGE_RADIUS = 0.2
OVERLAP_THRESHOLD = 0.85
KB_SIM_THRESHOLD = 0.95
MIN_CONFIDENCE_THRESHOLD = 0.1
MIN_RELATIVE_IMPROVEMENT = 0.1
VALIDATION_MIN_SCORE = 0.4
QUALITY_MIN_CONFIDENCE = 0.7
QUALITY_MAX_CONFIDENCE = 0.95
QUALITY_SCALE_FACTOR = 0.833


def hash_embedding_col(text: Column | str, dim: int = 16, max_chars: int = 5000) -> Column:
    """Deterministic bag-of-words random-projection embedding — the
    documented stand-in for the reference's ``get_text_embeddings`` (an
    OpenAI call; no model/network in this environment). Each token
    contributes a pseudo-random value in [−2, 2] per dimension (Spark's
    ``%`` keeps the dividend's sign) seeded by ``xxhash64(token,
    dim_index)``; the sum is L2-normalized. Similar texts
    share tokens and therefore directions, so coverage/convergence dynamics
    are realistic. Pure Catalyst — no UDF.

    ``max_chars`` mirrors the reference's ``content[:5000]`` cap
    (adaptive_crawler.py:1180)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(F.substring(c, 1, max_chars)), r"\s+"), lambda t: t != ""
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc
            + ((F.xxhash64(t, i) % 2001).cast("double") / 1000.0),
        ),
    )
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(
        nrm > 0, F.transform(raw, lambda x: (x / nrm).cast("float"))
    ).otherwise(F.transform(raw, lambda x: x.cast("float")))


def best_similarity_per_query(
    kb: DataFrame,
    queries: DataFrame,
    kb_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """(query_id, best_sim): max cosine of each query vector over the KB
    (the row-max of the reference's similarity matrix, :946-948). Queries
    are broadcast; the KB is scanned once and only Q rows shuffle."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qv"))
    )
    scored = kb.select(F.col(kb_vec).alias("_kv")).crossJoin(q)
    return (
        scored.groupBy("query_id")
        .agg(F.max(cosine_col(F.col("_qv"), F.col("_kv"))).alias("best_sim"))
    )


def coverage_gaps(
    queries: DataFrame,
    kb: DataFrame | None,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    best: DataFrame | None = None,
) -> DataFrame:
    """(query_id, embedding, gap): gap = min cosine DISTANCE to the KB =
    1 − best_sim (find_coverage_gaps :774-802); an empty/absent KB leaves
    every query at the maximum gap 1.0. Pass ``best`` (a precomputed
    ``best_similarity_per_query`` result, ideally cached) to avoid a
    second KB scan when the caller also needs the confidence."""
    base = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("embedding")
    )
    if kb is None:
        return base.withColumn("gap", F.lit(1.0))
    if best is None:
        best = best_similarity_per_query(
            kb, queries, query_id=query_id, query_vec=query_vec
        )
    return base.join(best, "query_id", "left").select(
        "query_id",
        "embedding",
        (F.lit(1.0) - F.coalesce("best_sim", F.lit(0.0))).alias("gap"),
    )


def embedding_confidence(
    kb: DataFrame | None, queries: DataFrame, tau: float | None = None
) -> dict:
    """calculate_confidence (:924-951): mean best-cosine per query (or the
    hit-rate of best ≥ tau when given), plus the avg/median metrics the
    reference stores. Empty KB → 0.0."""
    if kb is None:
        return {"confidence": 0.0, "avg_best_similarity": 0.0,
                "median_best_similarity": 0.0}
    best = best_similarity_per_query(kb, queries)
    row = best.agg(
        F.avg("best_sim").alias("avg"),
        F.median("best_sim").alias("med"),
        F.avg((F.col("best_sim") >= F.lit(tau if tau is not None else 0.0)).cast("double")).alias("hit"),
    ).first()
    if row is None or row["avg"] is None:
        return {"confidence": 0.0, "avg_best_similarity": 0.0,
                "median_best_similarity": 0.0}
    score = float(row["hit"]) if tau is not None else float(row["avg"])
    return {
        "confidence": score,
        "avg_best_similarity": float(row["avg"]),
        "median_best_similarity": float(row["med"]),
    }


def select_links_for_expansion(
    candidates: DataFrame,
    gaps: DataFrame,
    kb: DataFrame | None,
    id_col: str = "href",
    vec_col: str = "embedding",
    contextual_col: str | None = None,
    coverage_radius: float = COVERAGE_RADIUS,
    overlap_threshold: float = OVERLAP_THRESHOLD,
) -> DataFrame:
    """Gap-fill link scoring (select_links_for_expansion :804-921).

    For each candidate with an embedding: over the gaps whose distance
    exceeds ``coverage_radius``, sum 2·(gap − new_distance) for the gaps
    the link improves; divide by the number of gaps needing help; multiply
    by (1 − overlap_penalty) where the penalty is 2·(max KB similarity −
    threshold) when above threshold. Candidates carrying a truthy
    ``contextual_col`` blend 0.8·score + 0.2·contextual (the reference's
    ``if link.contextual_score`` — NULL *and 0.0* skip the blend). With an
    EMPTY gaps input the score is pinned at exactly 0.0 with no blend —
    the reference's ``if not gaps: score = 0.0`` (:869-870) short-circuits
    before the blend, which lives inside the else branch.

    Returns (id, gap_score, overlap_penalty, score). Candidates without an
    embedding are dropped, as the reference skips them."""
    keep = [id_col, vec_col] + ([contextual_col] if contextual_col else [])
    cand = candidates.select(*keep).filter(F.col(vec_col).isNotNull())

    needing = gaps.filter(F.col("gap") > coverage_radius).select(
        F.col("embedding").alias("_gv"), F.col("gap").alias("_gd")
    )
    # two broadcast scalar columns — gaps are ≤ Q rows. _n_gaps (the FULL
    # gap count) is needed besides _n_need: the reference short-circuits to
    # score = 0.0 BEFORE the contextual blend only when the gaps list
    # itself is empty (`if not gaps:` :869-870 — the blend sits inside the
    # else), whereas "gaps exist but none exceed the radius" falls through
    # to gap_reduction_score = 0 AND still blends
    n_need = F.broadcast(
        gaps.agg(
            F.count(F.lit(1)).alias("_n_gaps"),
            F.coalesce(
                F.sum((F.col("gap") > coverage_radius).cast("long")), F.lit(0)
            ).alias("_n_need"),
        )
    )
    improved = (
        cand.crossJoin(F.broadcast(needing))
        .withColumn("_new_d", F.lit(1.0) - cosine_col(F.col(vec_col), F.col("_gv")))
        .withColumn(
            "_impr",
            F.when(F.col("_new_d") < F.col("_gd"),
                   (F.col("_gd") - F.col("_new_d")) * 2.0).otherwise(F.lit(0.0)),
        )
        .groupBy(id_col)
        .agg(F.sum("_impr").alias("_total_impr"))
    )
    scored = (
        cand.join(improved, id_col, "left")
        .crossJoin(n_need)
        .withColumn(
            "gap_score",
            F.when(
                F.col("_n_need") > 0,
                F.coalesce("_total_impr", F.lit(0.0)) / F.col("_n_need"),
            ).otherwise(F.lit(0.0)),
        )
    )

    if kb is not None:
        overlap = best_similarity_per_query(
            kb, cand.select(id_col, vec_col), query_id=id_col, query_vec=vec_col
        ).withColumnRenamed("query_id", id_col)
        scored = scored.join(overlap, id_col, "left").withColumn(
            "overlap_penalty",
            F.when(
                F.col("best_sim") > overlap_threshold,
                (F.col("best_sim") - overlap_threshold) * 2.0,
            ).otherwise(F.lit(0.0)),
        ).drop("best_sim")
    else:
        scored = scored.withColumn("overlap_penalty", F.lit(0.0))

    score = F.col("gap_score") * (F.lit(1.0) - F.col("overlap_penalty"))
    if contextual_col:
        ctx = F.col(contextual_col)
        score = F.when(
            ctx.isNotNull() & (ctx != 0.0) & (F.col("_n_gaps") > 0),
            score * 0.8 + ctx * 0.2,
        ).otherwise(score)
    return scored.select(
        id_col, "gap_score", "overlap_penalty", score.alias("score")
    )


def kb_admit_new(
    kb: DataFrame | None,
    new_docs: DataFrame,
    id_col: str = "url",
    vec_col: str = "embedding",
    threshold: float = KB_SIM_THRESHOLD,
) -> DataFrame:
    """update_state deduplication (:1184-1214): a new document joins the KB
    only if its max similarity against the PRE-BATCH KB is below the
    threshold. Reference quirk preserved: the batch is compared against the
    knowledge base as it stood before the batch — two near-identical
    documents arriving in the same batch are BOTH admitted."""
    if kb is None:
        return new_docs
    mx = best_similarity_per_query(
        kb, new_docs.select(id_col, vec_col), query_id=id_col, query_vec=vec_col
    ).withColumnRenamed("query_id", id_col)
    return (
        new_docs.join(mx, id_col, "left")
        .filter(F.coalesce("best_sim", F.lit(-1.0)) < threshold)
        .drop("best_sim")
    )


def quality_confidence(
    learning_score: float,
    validation_score: float,
    validation_passed: bool,
    validation_min: float = VALIDATION_MIN_SCORE,
    quality_min: float = QUALITY_MIN_CONFIDENCE,
    quality_max: float = QUALITY_MAX_CONFIDENCE,
    scale_factor: float = QUALITY_SCALE_FACTOR,
) -> float:
    """get_quality_confidence (:1142-1167): validated systems map the
    0.4–0.7 learning band onto quality_min–quality_max; unvalidated get a
    conservative 0.8×."""
    if validation_passed and validation_score > validation_min:
        if learning_score < 0.4:
            return quality_min
        if learning_score > 0.7:
            return quality_max
        return quality_min + (learning_score - 0.4) * scale_factor
    return learning_score * 0.8
