"""Connected components over a pair relation — dedup-cluster assignment.

The missing last step of every near-dup pipeline: pair lists (from exact
Jaccard, MinHash-LSH, SimHash, or embedding cosine) only say "a ~ b";
keeping one document per duplicate GROUP needs the transitive closure —
a ~ b ~ c is one cluster even if (a, c) was never emitted as a pair.

Spark-first design: iterative min-label propagation, all joins/aggs.

- label(n) starts as n; each round every node takes the min of its own
  label and its neighbors' labels; fixpoint = every node carries the
  component's min id (a deterministic, engine-independent cluster id).
- Rounds needed = graph diameter. Near-dup graphs are dense little
  cliques (diameter 1-2, from pairwise emitters), so 2-3 rounds close
  them; ``max_iter`` guards adversarial chains. (For graphs with long
  chains at 100 TB, the alternating small-star/large-star algorithm
  [Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14] converges in O(log n) rounds with the same join/agg
  primitives — this implementation keeps the simpler propagation loop
  because duplicate clusters have tiny diameters by construction.)
- Each round ends in ``localCheckpoint`` — iterative self-joins
  otherwise double the logical plan per round and choke the optimizer
  long before the data is the bottleneck.
- The driver loop only inspects an aggregated change COUNT per round
  (one scalar), never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bidirectional_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) with both orientations of every edge, distinct, PERSISTED
    (callers unpersist when done). One pass over ``edges`` via explode —
    callers hand in raw pair PLANS, often an expensive near-dup join,
    and a union-of-two-selects form executed that plan twice before the
    persist could help. Shared by connected_components and pagerank so
    the edge-ingestion contract has one home."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .distinct()
        .persist()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 15,
) -> DataFrame:
    """(node, label) for every node appearing in ``edges``; label = min
    node id reachable from it. Deterministic for any edge direction or
    partitioning."""
    if max_iter < 1:
        # the for/else non-convergence guard below reads `changed` from the
        # final round — with zero rounds it would be unbound (NameError)
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    bidir = _bidirectional_edges(edges, src, dst)
    # initialization already performs round 1: label = min(self, neighbors)
    # — one aggregation, saving a full join+checkpoint+count cycle (pair
    # graphs from near-dup emitters are diameter ≤ 2 cliques, so most
    # runs then need just one confirming iteration)
    labels = (
        bidir.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("_min_nbr"))
        .select(
            "node",
            F.least(F.col("node"), F.col("_min_nbr")).alias("label"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            bidir.join(labels, bidir["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        # carry the convergence flag INSIDE the checkpointed round
        # (labels only ever decrease, so changed ⇔ nbr_min < label):
        # the change count is then a shuffle-free scan of the cached
        # partitions instead of a second old⋈new join job per round
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_min", F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        # silent truncation here would SPLIT true components (a path
        # graph longer than max_iter hops) and a downstream dedup would
        # keep duplicates — fail loudly instead
        bidir.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter (graph "
            "diameter exceeds the propagation budget)"
        )
    bidir.unpersist()
    return labels


def dedup_cluster_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Every document → its duplicate-cluster id (min doc id in the
    connected component; singletons map to themselves) + cluster size.
    ``SELECT ... WHERE doc_id = cluster_id`` is then the canonical
    keep-one-per-cluster dedup."""
    labels = connected_components(pairs, src=src, dst=dst)
    assigned = docs.select(F.col(id_col).alias("doc_id")).join(
        labels, F.col("doc_id") == labels["node"], "left"
    ).select(
        "doc_id",
        F.coalesce("label", F.col("doc_id")).alias("cluster_id"),
    )
    # cluster_size via partitioned window: one shuffle on cluster_id,
    # no second join (cluster count is O(docs) — not broadcastable)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return assigned.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w)
    ).select("doc_id", "cluster_id", "cluster_size")


def pagerank(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """PageRank over the UNDIRECTED graph of ``edges`` — fixed iteration
    count, no convergence test, so the result is a deterministic,
    engine-replayable function of the edge set (the oracle reruns the
    same recurrence in a recursive CTE).

    Undirected by construction (each edge contributes both ways): every
    node has degree ≥ 1, so there is no dangling-mass special case.
    r₀ = 1/N;  r_{t+1}(v) = (1−d)/N + d·Σ_{u∼v} r_t(u)/deg(u).

    Per round: one join of the rank vector onto the edge list + one
    aggregation by destination — both shuffles keyed on node id, the
    textbook MapReduce PageRank shape, linear per round at any scale.
    ``localCheckpoint`` per round keeps the iterated plan flat
    (same rule as connected_components above).
    """
    bidir = _bidirectional_edges(edges, src, dst)
    deg = bidir.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("u").alias("node"), "deg").localCheckpoint()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty edge relation (e.g. a pair emitter found nothing on a
        # clean corpus): return the empty result instead of dividing by
        # zero — the same graceful-empty contract connected_components
        # already has
        bidir.unpersist()
        return nodes.select("node", "deg", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", "deg", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            bidir.join(
                ranks.select(
                    F.col("node").alias("u"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("share").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )
    bidir.unpersist()
    return ranks.select("node", "deg", "rank")
