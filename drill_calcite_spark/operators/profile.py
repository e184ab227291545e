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


def discover_fds(df: DataFrame, columns: list[str], *,
                 approximate: bool = False) -> DataFrame:
    """Functional-dependency + unique-key discovery — the lattice walk of
    the reference's profiler (profile/Profiler.java:105-241,
    ProfilerImpl's FunctionalDependency / Unique statistics) restricted to
    single-column LHS, which is one distributed pass:

    - FD ``a → b`` holds iff ndv(a) == ndv((a,b)) — every LHS value maps
      to exactly one RHS value. NDVs use row-tuple semantics: a pair with
      a NULL field still counts (struct-based counting in both exact and
      HLL modes, matching SQL ``count(DISTINCT (a,b))``), so all three
      paths agree on nullable columns; with NULLs in the LHS the
      criterion is conservative (a NULL-LHS row inflates the pair NDV);
    - ``k`` is a unique key iff ndv(k) == n_rows, i.e. ``k → *`` (emitted
      as a row with rhs='*').

    All NDVs come from ONE wide aggregate (n singles + C(n,2) pairs, each
    pair shared by both FD directions) exploded into the long form.

    Scale notes: exact multi-distinct aggregates expand the input by the
    number of distinct aggregates — run on a (deterministic) sample like
    the reference's profiler does, or pass ``approximate=True`` for HLL
    sketches (single partial-aggregable pass, no expand) when discovering
    over full 100 TB tables; HLL error then makes 'holds' a heuristic,
    which is exactly Calcite's ``approximate`` AggregateCall mode.

    Output: (lhs, rhs, ndv_lhs, ndv_pair, fd_holds) — for rhs='*' rows,
    ndv_pair is n_rows.
    """
    ndv = F.approx_count_distinct if approximate else F.countDistinct

    def ndv2(a: str, b: str) -> F.Column:
        # always count distinct (a,b) STRUCTS: a struct with a NULL field
        # is itself non-null, so exact mode, HLL mode and the SQL oracle's
        # count(DISTINCT (a,b)) row-tuple semantics all agree on
        # NULL-bearing pairs (multi-arg countDistinct would drop them)
        return (F.approx_count_distinct(F.struct(a, b)) if approximate
                else F.countDistinct(F.struct(a, b)))

    idx = {c: i for i, c in enumerate(columns)}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        aggs.append(ndv(c).alias(f"__nd_{i}"))
    pairs = [(a, b) for i, a in enumerate(columns)
             for b in columns[i + 1:]]
    # positional aliases: name-based ones collide for underscore-bearing
    # columns (('x', 'y_z') vs ('x_y', 'z') both make __ndp_x_y_z)
    for a, b in pairs:
        aggs.append(ndv2(a, b).alias(f"__ndp_{idx[a]}_{idx[b]}"))
    wide = df.agg(*aggs)

    def single_ndv(c: str) -> F.Column:
        return F.col(f"__nd_{idx[c]}")

    def pair_ndv(a: str, b: str) -> F.Column:
        i, j = sorted((idx[a], idx[b]))
        return F.col(f"__ndp_{i}_{j}")

    rows = []
    for a in columns:
        for b in columns:
            if a == b:
                continue
            rows.append(F.struct(
                F.lit(a).alias("lhs"), F.lit(b).alias("rhs"),
                single_ndv(a).cast("long").alias("ndv_lhs"),
                pair_ndv(a, b).cast("long").alias("ndv_pair"),
                (single_ndv(a) == pair_ndv(a, b)).alias("fd_holds"),
            ))
        rows.append(F.struct(
            F.lit(a).alias("lhs"), F.lit("*").alias("rhs"),
            single_ndv(a).cast("long").alias("ndv_lhs"),
            F.col("__n").cast("long").alias("ndv_pair"),
            (single_ndv(a) == F.col("__n")).alias("fd_holds"),
        ))
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.lhs", "p.rhs", "p.ndv_lhs", "p.ndv_pair", "p.fd_holds")
    )
