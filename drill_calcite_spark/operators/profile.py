"""Data profiler — per-column statistics in one distributed pass.

Reference parity: Profiler computes per-column cardinality, null counts and
value ranges over a table (core/.../profile/Profiler.java:105-241,
ProfilerImpl.java); its aggregate calls carry an ``approximate`` flag
(rel/core/AggregateCall.java:45-55). Here: one wide agg row (count +
count(col) + [approx_]count_distinct + min/max per column) unpivoted into
the long (column, stat…) form.

Scale notes: exact NDV shuffles per-column distinct sets — fine for
profiling samples; pass approximate=True for HyperLogLog NDV
(approx_count_distinct) which keeps the whole profile a single
partial-aggregable pass, the right mode for 100 TB tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, *,
            approximate: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all): returns one row per column with
    (column, n_rows, n_nulls, n_distinct, min_val, max_val) — min/max cast
    to string so heterogeneous column types share one schema."""
    cols = columns if columns is not None else df.columns
    ndv = F.approx_count_distinct if approximate else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            ndv(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_val"),
            F.col(f"__mx_{c}").alias("max_val"),
        )
        for c in cols
    ])
    return (
        wide.select(F.explode(per_col).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct",
                "p.min_val", "p.max_val")
    )
