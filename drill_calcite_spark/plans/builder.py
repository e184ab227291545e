"""Rel — a RelBuilder-style fluent builder over Spark DataFrames.

Reference parity: mirrors Calcite's ``tools/RelBuilder.java`` verb set
(scan:1067, filter:1178, project:1229, aggregate:1548, distinct:1542,
union/intersect/minus:1764-1811, join:1936, semiJoin/antiJoin:2077-2121,
correlate:2007, values:2147, sort/sortLimit/limit:2300-2354,
exchange/sortExchange:2305-2312, transientScan/repeatUnion:1822-1896,
sample via rel/core/Sample.java:36, uncollect via rel/core/Uncollect.java:46).

Unlike RelBuilder (which builds a RelNode tree for the Volcano planner), each
verb here immediately produces a new lazy DataFrame — the Catalyst optimizer
is the planner, so declaring the op IS building the optimized plan
(SURVEY.md §3.2: "this *is* the PySpark DataFrame API").

Calcite-faithful semantics preserved explicitly:
- ``IS NOT DISTINCT FROM`` join keys → ``eqNullSafe``
- MULTISET equality → sort-before-compare (``multiset_eq`` helper)
- semi/anti joins as first-class verbs (JoinRelType.java:24-71)
- aggregate with groupingSets / rollup / cube (rel/core/Aggregate.java:109-135)

Scale notes: verbs add no materialization and never collect; ``exchange``
exposes RelDistribution (rel/RelDistribution.java:54-84) as
repartition/repartitionByRange/coalesce/broadcast-hint so callers can shape
shuffles the way Calcite's Exchange node does.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


class Rel:
    """Stack-less fluent builder: each verb returns a new ``Rel``."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ------------------------------------------------------------------ leafs
    @classmethod
    def scan(cls, spark: SparkSession, table: str) -> "Rel":
        """RelBuilder.scan (tools/RelBuilder.java:1067)."""
        return cls(spark.table(table))

    @classmethod
    def parquet(cls, spark: SparkSession, path: str) -> "Rel":
        return cls(spark.read.parquet(path))

    @classmethod
    def values(
        cls,
        spark: SparkSession,
        rows: Sequence[tuple],
        schema: str | Sequence[str],
    ) -> "Rel":
        """RelBuilder.values (tools/RelBuilder.java:2147) / rel/core/Values.java:46."""
        return cls(spark.createDataFrame(list(rows), schema=schema))

    @classmethod
    def empty(cls, spark: SparkSession, schema: str) -> "Rel":
        """RelBuilder.empty (tools/RelBuilder.java:2224): zero-row relation."""
        return cls(spark.createDataFrame([], schema=schema))

    # ------------------------------------------------------------ single-input
    def filter(self, *conditions: ColumnOrName) -> "Rel":
        """rel/core/Filter.java:51 — conjunction of predicates."""
        out = self.df
        for c in conditions:
            out = out.filter(_col(c) if isinstance(c, Column) else c)
        return Rel(out)

    def project(self, *exprs: ColumnOrName) -> "Rel":
        """rel/core/Project.java:57."""
        return Rel(self.df.select(*exprs))

    def project_plus(self, **named_exprs: Column) -> "Rel":
        """Add computed columns, keeping existing ones (RelBuilder.projectPlus)."""
        return Rel(self.df.withColumns(named_exprs))

    def rename(self, mapping: dict[str, str]) -> "Rel":
        return Rel(self.df.withColumnsRenamed(mapping))

    def aggregate(
        self,
        group_keys: Sequence[ColumnOrName],
        *aggs: Column,
        grouping_sets: Sequence[Sequence[str]] | None = None,
        rollup: bool = False,
        cube: bool = False,
    ) -> "Rel":
        """rel/core/Aggregate.java:73 with groupSets (:109-135).

        ``rollup``/``cube``/``grouping_sets`` are mutually exclusive, like
        Aggregate.Group {SIMPLE, ROLLUP, CUBE, OTHER} (Aggregate.java:465-469).
        """
        if sum((bool(grouping_sets), rollup, cube)) > 1:
            raise ValueError("rollup/cube/grouping_sets are mutually exclusive")
        if grouping_sets is not None:
            gb = self.df.groupingSets([list(g) for g in grouping_sets], *group_keys)
        elif rollup:
            gb = self.df.rollup(*group_keys)
        elif cube:
            gb = self.df.cube(*group_keys)
        else:
            gb = self.df.groupBy(*group_keys)
        return Rel(gb.agg(*aggs))

    def distinct(self) -> "Rel":
        """RelBuilder.distinct (tools/RelBuilder.java:1542)."""
        return Rel(self.df.distinct())

    def sort(self, *keys: ColumnOrName) -> "Rel":
        """rel/core/Sort.java:45 (collation part)."""
        return Rel(self.df.orderBy(*keys))

    def sort_limit(self, offset: int, fetch: int | None, *keys: ColumnOrName) -> "Rel":
        """rel/core/Sort.java:45 — sort + offset + fetch in one node.

        Spark plans orderBy().limit(k) as TakeOrderedAndProject (top-k without
        a full sort — the same optimization Calcite gets from
        EnumerableLimitSort).
        """
        out = self.df.orderBy(*keys) if keys else self.df
        if offset:
            out = out.offset(offset)
        if fetch is not None:
            out = out.limit(fetch)
        return Rel(out)

    def limit(self, n: int, offset: int = 0) -> "Rel":
        return self.sort_limit(offset, n)

    def sample(self, fraction: float, seed: int | None = None) -> "Rel":
        """rel/core/Sample.java:36 — TABLESAMPLE BERNOULLI(fraction) REPEATABLE(seed)."""
        return Rel(self.df.sample(fraction=fraction, seed=seed))

    def uncollect(self, array_col: ColumnOrName, *, ordinality: bool = False,
                  keep: Sequence[str] | None = None,
                  alias: str = "elem", ordinality_alias: str = "ord") -> "Rel":
        """rel/core/Uncollect.java:46 — UNNEST [WITH ORDINALITY]."""
        keep_cols = [F.col(c) for c in (keep if keep is not None else self.df.columns)]
        if ordinality:
            ex = F.posexplode(_col(array_col)).alias(ordinality_alias, alias)
            out = self.df.select(*keep_cols, ex)
            # SQL ordinality is 1-based; posexplode is 0-based.
            out = out.withColumn(ordinality_alias, F.col(ordinality_alias) + F.lit(1))
        else:
            out = self.df.select(*keep_cols, F.explode(_col(array_col)).alias(alias))
        return Rel(out)

    # ---------------------------------------------------------------- two-input
    _JOIN_TYPES = {
        "inner": "inner", "left": "left", "right": "right", "full": "full",
        "semi": "left_semi", "anti": "left_anti",
    }

    def join(self, other: "Rel", condition: Column | Sequence[str],
             join_type: str = "inner") -> "Rel":
        """rel/core/Join.java:55; types per JoinRelType.java:24-71.

        ``condition`` may be a Column (theta join — Spark picks
        BroadcastNestedLoopJoin for non-equi, mirroring
        EnumerableNestedLoopJoin.java:44) or a list of equi-key names.
        """
        how = self._JOIN_TYPES.get(join_type)
        if how is None:
            raise ValueError(f"unknown join type {join_type!r}")
        on = condition if isinstance(condition, Column) else list(condition)
        return Rel(self.df.join(other.df, on=on, how=how))

    def semi_join(self, other: "Rel", condition: Column | Sequence[str]) -> "Rel":
        """RelBuilder.semiJoin (tools/RelBuilder.java:2077)."""
        return self.join(other, condition, "semi")

    def anti_join(self, other: "Rel", condition: Column | Sequence[str]) -> "Rel":
        """RelBuilder.antiJoin (tools/RelBuilder.java:2121)."""
        return self.join(other, condition, "anti")

    def correlate(self, array_expr: Column, alias: str = "elem",
                  join_type: str = "inner") -> "Rel":
        """rel/core/Correlate.java:68 — LATERAL over a set-returning expression.

        Spark decorrelates real correlated sub-queries itself; the remaining
        lateral use-case is exploding a per-row computed collection.
        """
        if join_type not in ("inner", "left"):
            raise ValueError("correlate supports inner/left (CorrelateJoinType)")
        fn = F.explode if join_type == "inner" else F.explode_outer
        return Rel(self.df.select("*", fn(array_expr).alias(alias)))

    def union(self, other: "Rel", *, all: bool = False) -> "Rel":
        """rel/core/Union.java:35 — by-name resolution, like SQL UNION."""
        out = self.df.unionByName(other.df)
        return Rel(out if all else out.distinct())

    def intersect(self, other: "Rel", *, all: bool = False) -> "Rel":
        """rel/core/Intersect.java:35."""
        return Rel(self.df.intersectAll(other.df) if all else self.df.intersect(other.df))

    def minus(self, other: "Rel", *, all: bool = False) -> "Rel":
        """rel/core/Minus.java:39 (EXCEPT)."""
        return Rel(self.df.exceptAll(other.df) if all else self.df.subtract(other.df))

    # ------------------------------------------------------------- distribution
    def exchange(self, distribution: str, *keys: ColumnOrName,
                 num_partitions: int | None = None) -> "Rel":
        """rel/core/Exchange.java:42 over RelDistribution (RelDistribution.java:54-84).

        HASH → repartition(keys); RANGE → repartitionByRange; SINGLETON →
        coalesce(1); ROUND_ROBIN/RANDOM → repartition(n); BROADCAST → broadcast
        hint (consumed by the next join).
        """
        d = distribution.upper()
        if d == "HASH":
            args = ([num_partitions] if num_partitions else []) + [_col(k) for k in keys]
            return Rel(self.df.repartition(*args))
        if d == "RANGE":
            args = ([num_partitions] if num_partitions else []) + [_col(k) for k in keys]
            return Rel(self.df.repartitionByRange(*args))
        if d == "SINGLETON":
            return Rel(self.df.coalesce(1))
        if d in ("ROUND_ROBIN", "RANDOM"):
            return Rel(self.df.repartition(num_partitions or self.df.sparkSession.sparkContext.defaultParallelism))
        if d == "BROADCAST":
            return Rel(F.broadcast(self.df))
        raise ValueError(f"unknown distribution {distribution!r}")

    def sort_exchange(self, distribution: str, keys: Sequence[ColumnOrName],
                      sort_keys: Sequence[ColumnOrName]) -> "Rel":
        """rel/core/SortExchange.java:44 — repartition then sortWithinPartitions."""
        return Rel(self.exchange(distribution, *keys).df.sortWithinPartitions(*sort_keys))

    # ------------------------------------------------------- custom operators
    def repeat_union(self, step, *, distinct: bool = True,
                     iteration_limit: int = 100) -> "Rel":
        """RelBuilder.repeatUnion (tools/RelBuilder.java:1822-1896) —
        recursive fixpoint with this Rel as the seed."""
        from drill_calcite_spark.operators import repeat_union as _ru

        return Rel(_ru(self.df, lambda f: step(Rel(f)).df,
                       distinct=distinct, iteration_limit=iteration_limit))

    def snapshot(self, as_of: str, *, valid_from: str = "valid_from",
                 valid_to: str = "valid_to") -> "Rel":
        """RelBuilder.snapshot (tools/RelBuilder.java:1104) /
        rel/core/Snapshot.java:47 — FOR SYSTEM_TIME AS OF."""
        from drill_calcite_spark.operators import snapshot as _snap

        return Rel(_snap(self.df, as_of, valid_from=valid_from, valid_to=valid_to))

    def match(self, **kwargs) -> "Rel":
        """RelBuilder.match (tools/RelBuilder.java:2474) / rel/core/Match.java:57
        — MATCH_RECOGNIZE; kwargs as operators.match_recognize."""
        from drill_calcite_spark.operators import match_recognize as _mr

        return Rel(_mr(self.df, **kwargs))

    def asof_join(self, other: "Rel", on: Sequence[str], left_ts: str,
                  right_ts: str, **kwargs) -> "Rel":
        """As-of join (see operators/asof.py) — the temporal-enrichment verb."""
        from drill_calcite_spark.operators import asof_join as _asof

        return Rel(_asof(self.df, other.df, on, left_ts, right_ts, **kwargs))

    def salted_join(self, other: "Rel", on: list[str], *, salts: int = 16,
                    how: str = "inner") -> "Rel":
        """Skew-mitigated equi-join (operators/skew.py): hot keys split
        across ``salts`` reducers, the (small) build side replicated."""
        from drill_calcite_spark.operators.skew import salted_join as _sj

        return Rel(_sj(self.df, other.df, on, salts=salts, how=how))

    def distribution(self, order_cols: Sequence[str], *, ntile: int,
                     num_partitions: int = 32) -> "Rel":
        """Global NTILE/CUME_DIST/PERCENT_RANK without a single-partition
        window (operators/ranks.py distributed_distribution)."""
        from drill_calcite_spark.operators.ranks import distributed_distribution

        return Rel(distributed_distribution(
            self.df, order_cols, ntile=ntile, num_partitions=num_partitions))

    def sample_system(self, every_k_pages: int, *,
                      page_rows: int = 8192) -> "Rel":
        """TABLESAMPLE SYSTEM (rel/core/Sample.java:36, isBernoulli()=false):
        page-level block sampling — keep every k-th page of ``page_rows``
        consecutive rows."""
        page = (F.monotonically_increasing_id() / F.lit(page_rows)).cast("bigint")
        return Rel(
            self.df.withColumn("__page", page)
            .filter(F.col("__page") % every_k_pages == 0)
            .drop("__page")
        )

    # ------------------------------------------------------------------- output
    def to_df(self) -> DataFrame:
        return self.df

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)


def multiset_eq(a: Column, b: Column) -> Column:
    """MULTISET equality: unordered, so sort before comparing
    (SqlTypeName MULTISET, SURVEY.md §1.2)."""
    return F.sort_array(a) == F.sort_array(b)


def is_not_distinct_from(a: Column, b: Column) -> Column:
    """IS NOT DISTINCT FROM (SqlStdOperatorTable — null-safe equality)."""
    return a.eqNullSafe(b)
