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
    )
    n_nodes = nodes.count()  # scalar; required by the teleport term
    if n_nodes == 0:
        return nodes.select("node", F.lit(None).cast("double").alias("rank"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    e = edges.join(out_deg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"),
        (F.lit(1.0) / F.col("__deg")).alias("__inv"),
    )
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
