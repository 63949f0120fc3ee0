"""Near-duplicate clustering: connected components over the pair graph.

Dedup pipelines don't stop at PAIRS — to actually drop duplicates each
document needs a canonical cluster id (keep min-id per component, drop
the rest). This is the missing reduce after minhash_lsh_pairs /
simhash_pairs / phash_neardup / embedding_neardup.

Algorithm: iterative min-label propagation, all DataFrame ops —
    label(v) ← min(label(v), min_{u ∈ N(v)} label(u))
per round (one equi-join + one groupBy-min, both map-side combinable),
with a driver-side convergence check. Rounds needed = eccentricity of
each component's min vertex ≤ component diameter. Near-dup graphs are
dense blobs of mutually-similar documents (diameter 1-3), so this
converges in a handful of rounds; labels only ever decrease, so every
round's work shrinks to the frontier. For adversarial long-chain graphs
the alternating large-star/small-star scheme gives O(log n) rounds —
not needed for the dedup workload this serves, noted for the seam.

Scale shape (100 TB): state per round = (vertex, label) pairs — O(V) —
plus the static symmetric edge list; each round shuffles on vertex id
only. Each round's frame is persisted and the previous one unpersisted
(the lineage would otherwise grow by one join per round and recompute
from scratch at every action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(doc_id, cluster_id) for every id appearing in ``pairs`` —
    cluster_id = the component's minimum id (the exact_dedup keep-id
    convention). Ids must be orderable (any Spark-comparable type).

    Raises after ``max_iters`` non-converged rounds instead of silently
    returning partial labels.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # each round is localCheckpoint'ed (eager): lineage would otherwise
    # accumulate one join per round and any action on the result would
    # replay the whole loop from scratch
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iters):
            nbr_min = (
                edges.join(labels, edges["dst"] == labels["id"])
                .groupBy("src")
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = (
                labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
                .select(
                    "id",
                    F.col("label").alias("old_label"),
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", "label")
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            changed = stepped.where(F.col("label") != F.col("old_label")).count()
            labels = stepped.select("id", "label")
            if changed == 0:
                return labels.select(
                    F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
                )
        raise RuntimeError(
            f"connected_components: no convergence in {max_iters} rounds "
            "(component diameter exceeds the bound — raise max_iters or "
            "switch to a star-contraction scheme)"
        )
    finally:
        edges.unpersist()


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The end product of a dedup pipeline: ``docs`` annotated with
    (cluster_id, keep) — ``keep`` is true for the canonical (min-id)
    member of each near-dup cluster and for every unclustered doc.
    Filtering ``keep`` yields the deduplicated corpus."""
    comp = connected_components(pairs, max_iters=25)
    return (
        docs.join(
            comp.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col(id_col))
        )
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
    )
