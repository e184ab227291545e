"""Skew-mitigated joins: salting.

Reference parity: Calcite models distribution/exchange planning
(RelDistribution.java:33) but has no runtime skew handling; Spark's AQE
skew-join (enabled in session.py) splits oversized partitions at runtime
for SORT-MERGE joins. Salting is the complementary, plan-level technique
that also covers the cases AQE cannot touch — aggregations over skewed
keys and shuffle-hash joins — and works on any Spark version.

Mechanics: the fact side appends a salt in [0, salts); the (small) build
side is replicated ``salts`` times, once per salt value; the equi-join
runs on (key, salt), splitting each hot key's rows across ``salts``
reducers instead of one. Result is IDENTICAL to the unsalted join —
the salt only routes rows — at the cost of replicating the build side
``salts``×, which is why the build side must be the small one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

# Join types whose result is invariant under build-side replication: every
# build row appears once PER SALT, so any join that can emit an unmatched
# build row (right/full outer) would emit it ``salts`` times. Fact-side
# semantics are safe: each fact row carries exactly one salt and meets each
# build row at most once.
_SALT_SAFE_HOW = {
    "inner", "cross", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
}


def salted_join(
    fact: DataFrame, build: DataFrame, on: list[str], *,
    salts: int = 16, how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (large, possibly skewed on ``on``) with ``build``
    (small) on the given equi-join keys, salted ``salts`` ways.

    The fact-side salt is arbitrary per row (monotonically_increasing_id
    modulo salts — any assignment yields the same join result; this one is
    cheap and spreads consecutive rows evenly). The build side is
    replicated via a literal-array explode — a map-only stage.

    ``how`` must be a fact-side-preserving join (inner/left/semi/anti):
    right and full outer joins would duplicate unmatched build rows once
    per salt replica — for those, salt the other way around or rely on
    AQE skew handling."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join does not support how={how!r}: build-side "
            "replication would emit unmatched build rows once per salt. "
            "Supported: inner/cross/left/semi/anti (fact-preserving joins)."
        )
    fact_s = fact.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salts))
    )
    build_s = build.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return fact_s.join(build_s, on + [SALT_COL], how).drop(SALT_COL)
