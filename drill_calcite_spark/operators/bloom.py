"""Bloom-filter join pruning: a runtime semi-join filter that thins the
probe side of a join BEFORE its shuffle — the single biggest lever on a
selective fact⋈dim join at 100 TB.

Reference relation: Calcite plans semi-joins (SemiJoinRule,
core/src/main/java/org/apache/calcite/rel/rules/SemiJoinRule.java) and
leaves physical row-pruning to the engine; Drill's runtime generates
bloom filters for hash joins at execution time. Catalyst has its own
InjectRuntimeFilter (Spark 3.3+), but it fires on its cost heuristics
and only within one query plan — this operator makes the pattern an
explicit, reusable building block: the filter is a plain DataFrame you
can persist, ship across queries, or build once per day for a slowly
changing dim.

Classic Bloom 1970 (public): m bits, k hash functions; membership says
"definitely absent" or "maybe present" — NO FALSE NEGATIVES, so
``join(prune(big, bloom), small) == join(big, small)`` exactly, which is
precisely what the registry oracle pins with a plain SQL join.

Determinism: bit positions use the repo's md5 idiom (15 hex chars →
BIGINT, dedup.py precedent), salted per hash index — portable, stable
across engines and runs.

Scale shape:

- BUILD: one aggregation over the small side capped at m cells (the
  distinct bit positions; partial aggregation collapses map-side), then
  the bit-position LIST (≤ m int64s, m defaulting to 8192 — the
  payload is tens of KB) collapses to ONE row.
- PRUNE: the one-row bit set broadcast-crossJoins the big side and
  membership is a pure column expression (k array_contains probes per
  row — JVM-side, no shuffle, no Python). Rows failing any probe are
  definitely not in the build side and drop before the join's exchange.
- The surviving candidates still run the EXACT join — the bloom only
  removes rows, never fabricates matches.

For a build side too large to hold distinct bit positions in one array,
raise ``m`` awareness: the array is bounded by m (not by build
cardinality) — 8192 positions ≈ 64 KB; even m = 2^20 broadcasts fine.
False-positive rate ≈ (1 - e^{-kn/m})^k; with n distinct keys ≤ m/10
and k = 3 it stays under 1%% — callers size m from their dim
cardinality, and correctness never depends on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 8192
BLOOM_HASHES = 3


def _bit(key: Column, salt: int, m: int) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"b{salt}:"),
                                       key.cast("string"))), 1, 15),
            16, 10,
        ).cast("bigint") % m
    )


def bloom_build(small: DataFrame, key_col: str, *, m: int = BLOOM_BITS,
                k: int = BLOOM_HASHES) -> DataFrame:
    """ONE row: (bits array<bigint> — the sorted distinct set bit
    positions, n_bits int). Aggregation key space ≤ m regardless of
    build cardinality."""
    pos = small.select(
        F.explode(
            F.array(*[_bit(F.col(key_col), j, m) for j in range(1, k + 1)])
        ).alias("p")
    ).distinct()
    return pos.agg(
        F.array_sort(F.collect_list("p")).alias("bits"),
        F.count(F.lit(1)).cast("int").alias("n_bits"),
    )


def bloom_prune(big: DataFrame, bloom: DataFrame, key_col: str, *,
                m: int = BLOOM_BITS, k: int = BLOOM_HASHES) -> DataFrame:
    """Drop rows whose key is DEFINITELY not in the build side: every
    one of the k probe bits must be set. Map-only — the one-row bloom
    broadcasts; no false negatives, so downstream joins lose nothing."""
    probes = [
        F.array_contains(F.col("__bloom_bits"), _bit(F.col(key_col), j, m))
        for j in range(1, k + 1)
    ]
    cond = probes[0]
    for p in probes[1:]:
        cond = cond & p
    return (
        big.crossJoin(F.broadcast(bloom.select(F.col("bits")
                                               .alias("__bloom_bits"))))
        .filter(cond)
        .drop("__bloom_bits")
    )
