"""Materialized-view / lattice-tile rewrite.

Reference parity: Calcite rewrites queries onto registered materialized
views when the view subsumes the query (AbstractMaterializedViewRule ×6,
plan/RelOptMaterializations.java:70-105) and rolls aggregates up from
lattice tiles (AggregateStarTableRule, materialize/Lattice.java:93). OSS
Catalyst has neither, so this is a custom layer (SURVEY.md §4.1 ❌ rows).

Scope (v1, the useful 80%): AGGREGATE tiles. A view is a pre-aggregated
tile over (dims, measures); a query asking for a dim subset with
re-aggregable measures is served by rolling the tile up instead of
scanning the base table. Re-aggregation algebra:

    sum      → sum(sum_tile)        count(*)   → sum(count_*_tile)
    min      → min(min_tile)        count(col) → sum(count_col_tile)
    max      → max(max_tile)
    avg(col) → sum(sum_col_tile) / sum(count_col_tile)   (derived, never stored)

NULL fidelity: avg and count(col) re-aggregate from a *per-column*
non-null count tile (count(col)), never from count(*) — so tile-served
and base-served results are identical even when the measure column
contains NULLs.

Scale notes: tiles are parquet, typically 10^3-10^6× smaller than the
fact table; the rollup is a shuffle over the tile only. Tile freshness is
the caller's contract (rebuild on data change), exactly as with Calcite's
materializations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# measure spec: out_name -> (op, source_col); op ∈ SUPPORTED_OPS ∪ {"avg"}
SUPPORTED_OPS = {"sum", "count", "min", "max"}


def _tile_col(op: str, col: str) -> str:
    return f"__{op}_{col}"


@dataclass
class _Tile:
    name: str
    table: str
    dims: tuple[str, ...]
    ops: frozenset  # of (op, col) pairs stored in the tile
    path: str


@dataclass
class MaterializedViews:
    """Registry + rewriter for aggregate tiles."""

    spark: SparkSession
    tiles: list[_Tile] = field(default_factory=list)

    def create(
        self, name: str, table: str, base: DataFrame,
        dims: list[str], measures: list[tuple[str, str]], path: str,
    ) -> None:
        """CREATE MATERIALIZED VIEW name AS SELECT dims, aggs FROM table
        GROUP BY dims (server/.../SqlCreateMaterializedView.java). A
        ``count(*)`` tile is always added; an ``avg`` measure stores its
        (sum, count(col)) pair so NULL-aware re-aggregation is exact."""
        ops: set[tuple[str, str]] = set()
        for op, col in measures:
            if op == "avg":
                ops |= {("sum", col), ("count", col)}
            elif op in SUPPORTED_OPS:
                ops.add((op, col))
        ops |= {("count", "*")}
        aggs = []
        for op, col in sorted(ops):
            if op == "count":
                aggs.append(F.count(F.lit(1) if col == "*" else F.col(col))
                            .alias(_tile_col(op, col)))
            else:
                aggs.append(getattr(F, op)(col).alias(_tile_col(op, col)))
        base.groupBy(*dims).agg(*aggs).write.mode("overwrite").parquet(path)
        self.tiles.append(_Tile(name, table, tuple(dims), frozenset(ops), path))

    def _needed_ops(self, measures: list[tuple[str, str, str]]) -> set:
        need = set()
        for _out, op, col in measures:
            if op == "avg":
                need |= {("sum", col), ("count", col)}
            else:
                need.add((op, col))
        return need

    def find_tile(self, table: str, dims: list[str],
                  measures: list[tuple[str, str, str]]) -> _Tile | None:
        """A tile serves the query iff its dims ⊇ query dims (rollup is
        possible) and it stores every needed measure. Prefer the smallest
        (fewest-dims) qualifying tile."""
        need = self._needed_ops(measures)
        cands = [
            t for t in self.tiles
            if t.table == table and set(dims) <= set(t.dims) and need <= t.ops
        ]
        return min(cands, key=lambda t: len(t.dims)) if cands else None

    def summarize(
        self, table: str, base: DataFrame, dims: list[str],
        measures: list[tuple[str, str, str]],
    ) -> DataFrame:
        """The rewrite entry point: GROUP BY ``dims`` computing ``measures``
        (list of (out_name, op, col)) — served from a tile when one
        subsumes the query, else from the base table. Both paths produce
        identical schemas and values."""
        tile = self.find_tile(table, dims, measures)
        if tile is None:
            aggs = [self._base_agg(op, col).alias(out)
                    for out, op, col in measures]
            return base.groupBy(*dims).agg(*aggs)
        tdf = self.spark.read.parquet(tile.path)
        aggs = [self._rollup_agg(op, col).alias(out)
                for out, op, col in measures]
        return tdf.groupBy(*dims).agg(*aggs)

    @staticmethod
    def _base_agg(op: str, col: str):
        if op == "count":
            return F.count(F.lit(1)) if col == "*" else F.count(col)
        if op == "avg":
            return F.avg(col)
        return getattr(F, op)(col)

    @staticmethod
    def _rollup_agg(op: str, col: str):
        if op == "sum":
            return F.sum(_tile_col("sum", col))
        if op == "count":
            return F.sum(_tile_col("count", col))
        if op == "min":
            return F.min(_tile_col("min", col))
        if op == "max":
            return F.max(_tile_col("max", col))
        if op == "avg":
            # sum(col)/count(col): NULL-aware, identical to F.avg on the base
            # (all-NULL group → NULL/0 → NULL in Spark, matching avg()).
            return (F.sum(_tile_col("sum", col))
                    / F.sum(_tile_col("count", col)))
        raise ValueError(f"unsupported measure op {op!r}")
