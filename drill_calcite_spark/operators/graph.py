"""Iterative graph algorithms on DataFrames: PageRank.

Reference parity: the class of ITERATIVE plans the reference executes via
RepeatUnion/Spool (rel/core/RepeatUnion.java — same machinery as our
operators/repeat_union.py) — PageRank is the canonical member. The loop
runs driver-side but every iteration is a LAZY distributed plan: one
edges⋈ranks shuffle + one groupBy per iteration, nothing collected.

Determinism contract (what makes a DuckDB recursive-CTE oracle replay
this bit-for-bit): per-edge contributions are double products (IEEE,
engine-identical), but their SUM is order-dependent in float — so each
contribution is cast to DECIMAL(28,12) and summed exactly
(order-independent), then the damping update runs in double on the exact
sum. See the oracle in queries/llm.py.

Scale notes: ranks are (node, rank) — tiny next to edges; the edge list
is the big side and is never re-shuffled if pre-partitioned by src.
``localCheckpoint`` every few iterations truncates the lineage the loop
would otherwise stack (same spool trick as repeat_union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, *, src: str = "src", dst: str = "dst",
    iterations: int = 5, damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over a directed edge list. Nodes = every id appearing as
    src or dst; dangling nodes keep only the teleport term. Returns
    (node, rank double) after ``iterations`` synchronous updates from the
    uniform start 1/N."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        # joined in EVERY iteration layer of the final plan — checkpoint
        # once (lazily; the n_nodes count below materializes it) so the
        # union+distinct runs once, not once per iteration (r14)
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # scalar; required by the teleport term
    if n_nodes == 0:
        return nodes.select("node", F.lit(None).cast("double").alias("rank"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    # same: the normalized edge list appears once per iteration in the
    # final plan; without a checkpoint the edges⋈out_deg join would
    # execute `iterations` times in the one job
    e = edges.join(out_deg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"),
        (F.lit(1.0) / F.col("__deg")).alias("__inv"),
    ).localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for i in range(iterations):
        contrib = (
            e.join(ranks, e.__src == ranks.node)
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") * F.col("__inv")).cast("decimal(28,12)")
                .alias("__c"),
            )
        )
        summed = contrib.groupBy("node").agg(
            F.sum("__c").cast("double").alias("__in")
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0)))
                .alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def connected_components(
    edges: DataFrame, *, src: str = "src", dst: str = "dst",
    max_iterations: int = 25, checkpoint_every: int = 1,
) -> DataFrame:
    """Connected components over an undirected edge list via synchronous
    min-label propagation: every node starts as its own component and
    repeatedly takes the minimum component id among itself and its
    neighbors until a fixed point. Returns (node, component) where
    component = the smallest node id in the node's component.

    This is the cluster-formation step a dedup pipeline needs after
    candidate-pair generation: MinHash/LSH emits near-duplicate PAIRS
    (operators/dedup.py); keeping one document per duplicate GROUP
    requires the transitive closure of those pairs — see
    queries/llm.py `dedup_clusters`. Reference parity: the iterative
    RepeatUnion/Spool plan class (rel/core/RepeatUnion.java), same as
    pagerank above.

    Scale contract: each round is ONE edges⋈labels shuffle + one
    min-aggregate — labels are (node, component), tiny next to edges,
    and broadcast when small. Rounds needed = graph diameter; LSH
    near-dup clusters are near-cliques (diameter ~2), so 3-4 rounds
    close real corpora — far below GraphX's alternating large/small-star
    constant factors for this workload. Convergence is detected with one
    count() action per round (an O(nodes) aggregate, not a collect) and
    the loop stops early. ``checkpoint_every=1`` (r14): because the
    convergence count() is an ACTION every round, any round not ending
    in a checkpoint is executed twice — once by its own count() and
    again by the next round's (lineage recomputes from the last
    materialized point, so a block of k un-checkpointed rounds pays
    k(k+1)/2 join executions instead of k). A lazy localCheckpoint
    every round costs nothing extra — the count() that must run anyway
    is what materializes it — and each round's edges⋈labels join then
    executes exactly once.
    Deterministic: min() is order-independent, so the result is exact
    regardless of partitioning — a DuckDB recursive-CTE transitive
    closure replays it (the `dedup_clusters` oracle).
    """
    und = (
        edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
        .union(edges.select(F.col(dst).alias("__a"),
                            F.col(src).alias("__b")))
        .distinct()
        # joined every round; checkpoint once (materialized by round
        # 1's convergence count) so the symmetrize+distinct — and the
        # whole upstream pair pipeline — doesn't re-execute per round
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("__a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iterations):
        neigh_min = (
            und.join(labels, und.__b == labels.node)
            .groupBy(F.col("__a").alias("node"))
            .agg(F.min("component").alias("__nmin"))
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__nmin"), F.col("component")),
                ).alias("component"),
                F.col("component").alias("__old"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(
            F.col("component") != F.col("__old")).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            break
    else:
        # loop exhausted with labels still moving: the ids are only
        # partially propagated (wrong) — e.g. a path graph with diameter
        # > max_iterations. Fail loudly rather than return bad clusters
        # (ADVICE r7). LSH dedup graphs are near-cliques (diameter ~2),
        # so a trip here means the input is not the intended workload.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            f"max_iterations for high-diameter graphs")
    return labels
