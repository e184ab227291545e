"""Lattice / tile suggester — derive which aggregate tiles to materialize
from an observed query workload.

Reference parity: Calcite's LatticeSuggester grows a lattice from parsed
queries (materialize/LatticeSuggester.java:75 ``addQuery`` — each query
contributes its grouping columns and measures) and TileSuggester.java
picks which tiles of that lattice to materialize, trading tile build cost
against the queries each tile serves. Our analogue works on declarative
workload entries (the information LatticeSuggester extracts from SqlNode
trees) and estimates tile sizes from real column NDVs — the distributed
part — using the profiler (operators/profile.py), mirroring Lattice's
``getRowCountEstimate``.

Algorithm (the useful core of TileSuggester's Monte-Carlo/greedy hybrid):

1. Every distinct grouping set in the workload is a CANDIDATE tile; its
   weight = how many workload queries it can serve (query grouping ⊆ tile
   grouping — the same subsumption test plans/materialized.py applies
   when routing, so suggested tiles are immediately usable as
   ``AggTile``\\ s).
2. Tile size is estimated as min(n_rows, Π ndv(dim)) — the independence
   assumption Calcite's Lattice.getRowCountEstimate makes.
3. Greedy selection by benefit: repeatedly take the candidate with the
   highest (served queries not yet served) / log10(est_rows + 10); a tile
   whose queries are already all served by chosen tiles is skipped. This
   is deterministic (ties break on the tile's dim tuple), so results are
   reproducible across runs and engines.

Scale notes: the only distributed work is the NDV profile over the fact
table (one pass, HLL-able via ``approximate=True``); the lattice algebra
itself is planner-side metadata work, exactly where Calcite runs it.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class WorkloadQuery:
    """What LatticeSuggester.addQuery extracts per query: the grouping
    columns and the measures it aggregates."""
    name: str
    group_by: tuple[str, ...]
    measures: tuple[str, ...]  # "op:col" strings, e.g. "sum:o_totalprice"


def lattice_algebra(workload: Sequence[WorkloadQuery]):
    """The planner-side set algebra (no data touched): candidate tiles
    keyed by sorted dim tuple → (measure union, served queries). A tile
    serves q iff q.group_by ⊆ tile dims and q.measures ⊆ tile measures;
    each tile carries the measure union of every query it subsumes, so
    serving is real (the tile can be declared as an AggTile directly)."""
    candidates: dict[tuple[str, ...], set[str]] = {}
    for q in workload:
        candidates.setdefault(tuple(sorted(q.group_by)), set())
    for dims in candidates:
        for q in workload:
            if set(q.group_by) <= set(dims):
                candidates[dims] |= set(q.measures)
    serves = {
        dims: [q for q in workload
               if set(q.group_by) <= set(dims)
               and set(q.measures) <= candidates[dims]]
        for dims in candidates
    }
    return candidates, serves


def _dim_stats(fact: DataFrame, workload: Sequence[WorkloadQuery],
               approximate: bool):
    """One distributed NDV profile over the workload's dim columns →
    (est_rows function, n_rows). Shared by candidate_tiles and
    suggest_tiles so the Lattice.getRowCountEstimate formula lives in
    exactly one place."""
    from drill_calcite_spark.operators.profile import profile

    all_dims = sorted({c for q in workload for c in q.group_by})
    stats = {
        r["column"]: (r["n_rows"], r["n_distinct"])
        for r in profile(fact, all_dims, approximate=approximate).collect()
    }
    n_rows = next(iter(stats.values()))[0] if stats else 0

    def est_rows(dims: tuple[str, ...]) -> int:
        prod = 1
        for d in dims:
            prod *= max(stats[d][1], 1)
        return min(prod, n_rows)

    return est_rows, n_rows


def candidate_tiles(
    spark: SparkSession,
    fact: DataFrame,
    workload: Sequence[WorkloadQuery],
    *,
    approximate: bool = False,
) -> DataFrame:
    """Every candidate tile with its NDV-product size estimate —
    LatticeSuggester.addQuery's lattice before TileSuggester selection.

    Returns (tile_dims, tile_measures, est_rows, n_served, serves);
    est_rows = min(n_rows, Π ndv(dim)) per Lattice.getRowCountEstimate's
    independence assumption. The NDV profile is the distributed part and
    is SQL-replayable, so this output is oracle-checkable."""
    est_rows, _ = _dim_stats(fact, workload, approximate)
    candidates, serves = lattice_algebra(workload)
    rows = [
        (",".join(dims), ",".join(sorted(candidates[dims])), est_rows(dims),
         len(serves[dims]), ",".join(sorted(q.name for q in serves[dims])))
        for dims in sorted(candidates)
    ]
    return spark.createDataFrame(
        rows,
        "tile_dims string, tile_measures string, est_rows long, "
        "n_served int, serves string",
    )


def suggest_tiles(
    spark: SparkSession,
    fact: DataFrame,
    workload: Sequence[WorkloadQuery],
    *,
    max_tiles: int | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Greedy tile selection over the candidates (TileSuggester's role):
    repeatedly take the candidate with the highest
    (newly served queries) / log10(est_rows + 10), skip tiles whose
    queries are already covered. Deterministic (ties break on the dim
    tuple). Returns the same schema as ``candidate_tiles``, chosen tiles
    only, in selection order."""
    est_rows, _ = _dim_stats(fact, workload, approximate)
    candidates, serves_map = lattice_algebra(workload)

    chosen: list[tuple[tuple[str, ...], list[WorkloadQuery], int]] = []
    covered: set[str] = set()
    remaining = dict(candidates)
    while remaining and (max_tiles is None or len(chosen) < max_tiles):
        scored = []
        for dims in remaining:
            serves = serves_map[dims]
            new = [q for q in serves if q.name not in covered]
            if not new:
                continue
            e = est_rows(dims)
            scored.append((len(new) / math.log10(e + 10), dims, serves, e))
        if not scored:
            break
        scored.sort(key=lambda s: (-s[0], s[1]))
        _, dims, serves, e = scored[0]
        chosen.append((dims, serves, e))
        covered |= {q.name for q in serves}
        del remaining[dims]

    rows = [
        (",".join(dims), ",".join(sorted(candidates[dims])), e,
         len(serves), ",".join(sorted(q.name for q in serves)))
        for dims, serves, e in chosen
    ]
    return spark.createDataFrame(
        rows,
        "tile_dims string, tile_measures string, est_rows long, "
        "n_served int, serves string",
    )
