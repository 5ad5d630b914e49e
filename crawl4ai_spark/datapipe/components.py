"""Distributed connected components + near-duplicate GROUP assignment.

The pair-level dedup operators (datapipe/dedup.py, similarity.py) emit
edges; a real training-data pipeline needs the transitive closure — "keep
ONE representative per near-duplicate cluster" — which is connected
components over the pair graph. (The reference never needs this: its
CosineStrategy clusters one page in memory. At corpus scale the components
step is the difference between dropping A~B and B~C as two independent
pairs and correctly collapsing {A,B,C}.)

Algorithm: iterative MIN-LABEL PROPAGATION on DataFrames — every node
adopts the smallest label in its closed neighborhood; repeat until no
label changes. Each round is one join + one groupBy (both on the node id),
fully distributed; rounds needed = graph diameter. Near-duplicate graphs
have tiny diameters (clusters are quasi-cliques — band-collision edges
connect most members pairwise), so convergence takes a handful of rounds;
the round cap guards against pathological chain graphs, for which the
O(log n)-round large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) is the documented
upgrade path. Every round localCheckpoints the label table: it truncates
the exponentially-growing lineage AND decouples round n+1 from recomputing
rounds 1..n.

Determinism: labels are min node ids — independent of partitioning,
iteration order, and cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id of the connected component. Raises if ``max_rounds`` label
    rounds don't converge (diameter > max_rounds — see module docstring for
    the contraction-algorithm upgrade path)."""
    # symmetrize once; self-contained node table
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # neighbor labels: for edge (u,v), u sees v's current label
        nbr = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "component")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "graph diameter exceeds the cap; raise max_rounds or switch to the "
        "large-star/small-star contraction for chain-shaped graphs"
    )


def minhash_dedup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    hash_fn=None,
    hot_bucket_cap: int | None = None,
) -> DataFrame:
    """Document-level near-duplicate GROUPS: MinHash+LSH verified pairs →
    connected components → (doc_id, group_id, group_size, is_representative)
    for EVERY input document (singletons keep their own id as group).
    ``is_representative`` = min-id member — the row a dedup pipeline keeps.
    The pair stage's hot-bucket star diversion (dedup.HOT_BUCKET_CAP) is
    exactly component-preserving here: a star reaches every member of the
    diverted bucket, so group assignments are unchanged."""
    from crawl4ai_spark.datapipe.dedup import HOT_BUCKET_CAP, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        df, id_col, text_col, k=k, num_hashes=num_hashes, bands=bands,
        threshold=threshold, hash_fn=hash_fn,
        hot_bucket_cap=HOT_BUCKET_CAP if hot_bucket_cap is None else hot_bucket_cap,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    docs = df.select(F.col(id_col).cast("long").alias("doc_id"))
    labeled = (
        docs.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .withColumn("group_id", F.coalesce("component", F.col("doc_id")))
        .drop("component")
    )
    sizes = labeled.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        labeled.join(sizes, "group_id")
        .select(
            "doc_id",
            "group_id",
            "group_size",
            (F.col("doc_id") == F.col("group_id")).alias("is_representative"),
        )
    )
