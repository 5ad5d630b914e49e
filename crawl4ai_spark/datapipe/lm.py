"""Corpus-trained unigram LM perplexity — the CCNet-style quality signal.

CCNet (Wenzek et al. 2020, public) buckets web documents by the perplexity
of a pretrained KenLM 5-gram. No pretrained model (or network) exists in
this environment, so the deterministic, oracle-checkable stand-in is a
unigram model trained on the corpus itself with add-alpha smoothing. The
SPARK PLAN SHAPE is the part that carries to 100 TB and is identical for
any model order:

- **train** = one token-keyed shuffle with map-side partial aggregation
  (token counts), then a distributed top-K (``orderBy(count desc, token
  asc).limit(K)`` compiles to TakeOrdered — every partition contributes a
  local top-K, no single-task global sort) — the vocabulary table is K
  rows, megabytes;
- **score** = explode tokens → BROADCAST join against the vocabulary
  (map-side, the corpus never shuffles for the lookup) → per-document
  mean logprob (partial-agg-safe) — ONE doc-keyed shuffle of
  (doc_id, partial sums), then ``ppl = exp(-mean logp)``.

Swapping in a real pretrained LM keeps the same seams: the vocabulary
table becomes the model's loaded score table (or the scoring join becomes
a ``mapInPandas`` over a broadcast model file); train_unigram_lm is then
simply unused.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawl4ai_spark.datapipe.textstats import tokens_col


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    alpha: float = 1.0,
    materialize: bool = True,
) -> tuple[DataFrame, float, int]:
    """Train the smoothed unigram model: returns ``(vocab, oov_logp, n)``
    where ``vocab`` is a (token, logp) DataFrame of the top-``vocab_size``
    tokens by count (count desc, token asc — a DETERMINISTIC tie-break, or
    reruns would ship different vocabularies), ``oov_logp`` scores every
    out-of-vocabulary token, and ``n`` is the total corpus token count.

    Add-alpha smoothing over V_eff + 1 outcomes, where
    V_eff = min(vocab_size, distinct corpus tokens) and the +1 is the OOV
    bucket: logp(t) = ln((c_t + alpha) / (n + alpha·(V_eff+1))),
    oov_logp = ln(alpha / (n + alpha·(V_eff+1))). Clamping to V_eff keeps
    the model proper (probabilities sum to 1) on corpora with fewer
    distinct tokens than the configured vocab_size — the unclamped
    denominator over-allocated OOV mass there. When the top-K limit DOES
    bind (distinct > vocab_size), truncated tokens all score as the single
    OOV bucket, so the distribution under-counts their mass — the standard
    CCNet-style vocabulary-truncation trade, not a bug. V_eff falls out of
    the top-K collect for free (fewer than vocab_size rows back ⇔ the
    limit never bound ⇔ row count IS the distinct count), so no extra job.
    """
    counts = (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # n via a MAP-ONLY sum of per-document token counts — computing it
    # from `counts` would evaluate the token-keyed shuffle (the expensive
    # train stage) once here and again for the vocabulary below
    n = int(
        df.agg(F.sum(F.size(tokens_col(text_col)))).first()[0] or 0
    )
    topk = counts.orderBy(F.col("c").desc(), F.col("token").asc()).limit(vocab_size)
    # ONE evaluation of the token shuffle here, on BOTH paths: the exact
    # V_eff clamp (and therefore the oov_logp SCALAR this function
    # returns) cannot be known without evaluating the counts. For
    # materialize=True (the hot-path API) this was always the cost — the
    # vocabulary ends up a local relation and no consumer ever re-runs
    # the train plan. materialize=False is the plan-inspection path and
    # now pays MORE than it used to: the collect here (new with the V_eff
    # clamp) plus the token shuffle AGAIN each time the returned lazy
    # vocab is evaluated. It deliberately does NOT cache topk (a .cache()
    # with no unpersist handle would pin an InMemoryRelation for the
    # session lifetime on every call) — production consumers must use
    # materialize=True.
    rows = topk.collect()
    v_eff = min(vocab_size, len(rows))
    denom = float(n) + alpha * (v_eff + 1)
    if materialize:
        # the (≤ vocab_size)-row vocabulary as a LOCAL relation: every
        # later consumer (the scoring broadcast, repeated queries) would
        # otherwise re-run the full corpus tokenize+shuffle train plan
        spark = df.sparkSession
        vocab = spark.createDataFrame(
            [(r["token"], math.log((r["c"] + alpha) / denom)) for r in rows],
            schema="token string, logp double",
        )
    else:
        # keep the lazy distributed plan (plan-shape tests) — value-
        # identical: the denom literal came from the collect above
        vocab = topk.select(
            "token",
            F.log((F.col("c") + F.lit(alpha)) / F.lit(denom)).alias("logp"),
        )
    oov_logp = math.log(alpha / denom) if denom > 0 else 0.0
    return vocab, oov_logp, n


def score_perplexity(
    df: DataFrame,
    vocab: DataFrame,
    oov_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram perplexity: exp(−mean token logprob) under the
    trained model. Returns (id, n_tokens, ppl); a zero-token document
    comes back with (0, NULL) rather than vanishing — the same
    every-input-row contract as linededup.

    The vocabulary join is explicitly broadcast (K rows by construction);
    the corpus-side explode never shuffles for the lookup, and the mean is
    computed with map-side partial aggregation."""
    toks = df.select(id_col, F.explode(tokens_col(text_col)).alias("token"))
    scored = (
        toks.join(F.broadcast(vocab), "token", "left")
        .withColumn("logp", F.coalesce("logp", F.lit(float(oov_logp))))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("_mean_lp"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.exp(-F.col("_mean_lp")).alias("ppl"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    vocab: DataFrame,
    oov_logp: float,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style gate: keep documents with ppl ≤ ``max_ppl`` (CCNet keeps
    the 'head'/'middle' perplexity buckets; a single threshold is the
    two-bucket form). Zero-token documents have no perplexity and are
    dropped explicitly."""
    p = score_perplexity(df, vocab, oov_logp, id_col, text_col)
    kept = p.filter(F.col("ppl") <= max_ppl).select(id_col, "ppl")
    return df.join(kept, id_col).select(*df.columns, "ppl")
