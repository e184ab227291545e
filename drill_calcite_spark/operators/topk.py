"""Exact bounded per-group top-K — the two-stage ranking that keeps
any single task from sorting a group's full population.

The problem at 100 TB: ``row_number() OVER (PARTITION BY g ORDER BY …)
<= k`` funnels EVERY row of a group through one window task — a whale
group (one web domain's shingles, one tenant's events) becomes a
single-task sort. AQE cannot split a window partition.

The two-stage rewrite (the r11 fix for the text_boilerplate_mask
scale-killer, factored out in r12 so it is reusable and fuzzable):

- **Stage 1** ranks within each (group, shuffle-partition) SLICE —
  ``Window.partitionBy(group, spark_partition_id())`` — and keeps k.
  Each task sorts only its own slice of the group.
- **Stage 2** merges the ≤ k·P surviving candidates per group with the
  plain per-group window — bounded by k·P rows, never the data.

Exactness argument (property-fuzzed in tests/test_topk_fuzzer.py over
adversarial tie distributions): provided the ORDER IS TOTAL (a
deterministic tiebreak — equal sort keys would make "the top k" itself
ill-defined), any member of a group's true top-k ranks ≤ k inside
whatever slice holds it: every row ahead of it in its slice is also
ahead of it globally, and globally there are < k such rows. So stage 1
never drops a true top-k member, and stage 2 computes the exact
answer on the surviving superset.

Reference parity: Calcite plans ``ORDER BY … FETCH k`` per group via
windowed filters (SqlStdOperatorTable RANK/ROW_NUMBER); the slicing
rewrite is an execution-shape concern its planner never faces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_group_topk(
    df: DataFrame, group_cols: "list[str]",
    order_cols: "list[Column]", k: int,
) -> DataFrame:
    """Exact top-``k`` rows per group under a TOTAL order, without any
    task ever sorting a group's full population.

    ``order_cols`` MUST be a total order over each group's rows
    (include a unique tiebreak column); with ties at the cut the
    slice-local ranking could otherwise keep a different k-subset than
    the global ranking. Returns the input columns unchanged.
    """
    clash = {"__pid", "__prk", "__rk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bounded_group_topk: input column(s) {sorted(clash)} "
            "collide with internal working columns; rename them first")
    part = Window.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    cand = (df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__prk", F.row_number().over(part))
            .filter(F.col("__prk") <= k)
            .drop("__pid", "__prk"))
    merge = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (cand.withColumn("__rk", F.row_number().over(merge))
            .filter(F.col("__rk") <= k)
            .drop("__rk"))
