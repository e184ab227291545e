"""Sketches: count-min (frequency) and HyperLogLog (distinct count) —
fixed-memory estimation over unbounded key cardinality, the "novel
sketch" operator class the reference's runtime does not ship (its
approximate story is APPROX_COUNT_DISTINCT, SqlStdOperatorTable;
explicit mergeable sketch state has no Calcite counterpart).

Cormode & Muthukrishnan 2005 (public): a d×w counter matrix; each key
increments one counter per row j at column ``h_j(key) mod w``; the
estimate is ``min_j C[j][h_j(key)]`` and NEVER underestimates — every
counter an item hashes to holds its true count plus non-negative
collision mass. With w = e/ε and d = ln(1/δ) the overestimate exceeds
εN with probability ≤ δ.

Cross-engine determinism: ``h_j(key)`` is the repo's standard md5
idiom — ``conv(substr(md5(j || ':' || key), 1, 15), 16, 10) % w``
(15 hex chars = 60 bits, fits BIGINT in both engines; the dedup.py
MinHash precedent) — so a DuckDB oracle reproduces the sketch cell for
cell and the driver hash can pin ESTIMATES, not just bounds.

Scale shape (the whole point of a sketch at 100 TB):

- Building the counters is ONE aggregation whose key space is capped at
  d×w cells regardless of corpus cardinality: the per-depth bucket ids
  explode map-side (d rows per input row, cheap column math), and
  partial aggregation collapses each task's stream to ≤ d×w partial
  cells BEFORE the exchange — the shuffle carries at most
  ``tasks × d × w`` tiny rows where a full groupBy(token) would carry
  the vocabulary.
- Sketches MERGE by cellwise addition (counters are linear), so
  per-partition / per-day sketches combine without re-reading data —
  :func:`cms_merge`, property-tested sketch(A∪B) = merge(sketch A,
  sketch B).
- Estimation touches only the candidate keys (explode × d, broadcast
  join against the 192-cell counter table, min per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drill_calcite_spark.operators.guards import (
    assert_cols_clear as _assert_keys_clear,
    assert_nonempty as _assert_nonempty,
)

CMS_DEPTH = 3
CMS_WIDTH = 64


def cms_bucket(key: Column, depth_j: Column | int) -> Column:
    """``h_j(key) mod w`` — deterministic, engine-portable."""
    j = F.lit(depth_j) if isinstance(depth_j, int) else depth_j
    salted = F.concat(j.cast("string"), F.lit(":"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10)
        .cast("bigint") % CMS_WIDTH
    )


def cms_sketch(df: DataFrame, key_col: str, weight_col: str | None = None,
               ) -> DataFrame:
    """Build the counter matrix: (j, bucket, cnt), ≤ CMS_DEPTH×CMS_WIDTH
    rows. ``weight_col`` (BIGINT) increments by weight; default 1."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
        w.cast("bigint").alias("w"),
    )
    return (
        cells.select("cell.j", "cell.bucket", "w")
        .groupBy("j", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_sketch_grouped(df: DataFrame, keys: "list[str]", key_col: str,
                       weight_col: str | None = None) -> DataFrame:
    """Per-GROUP counter matrices ``(keys..., j, bucket, cnt)`` — one
    d×w CMS per key combination in ONE aggregation (the per-source /
    per-tenant frequency telemetry pattern, completing the grouped
    sketch triad with qsketch_build_grouped and
    hll_registers_grouped). Keyspace ≤ d×w cells per group; map-side
    collapse before the exchange; per-group sketches still merge by
    cellwise addition."""
    _assert_keys_clear(keys, {"j", "bucket", "cnt", "cell", "w"},
                       "cms_sketch_grouped")
    _assert_keys_clear([key_col], {"j", "bucket", "cnt", "cell", "w"},
                       "cms_sketch_grouped", what="key")
    if weight_col is not None:
        # r12 advice: the fail-loud contract must cover the weight too —
        # a weight named 'w'/'cell' only resolves today by accident of
        # select ordering
        _assert_keys_clear([weight_col], {"j", "bucket", "cnt", "cell", "w"},
                           "cms_sketch_grouped", what="weight")
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        *keys,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
        w.cast("bigint").alias("w"),
    )
    return (
        cells.select(*keys, "cell.j", "cell.bucket", "w")
        .groupBy(*keys, "j", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate_grouped(sketch: DataFrame, keys: "list[str]",
                         probes: DataFrame, key_col: str) -> DataFrame:
    """``min_j C_g[j][h_j(key)]`` per (group, candidate key) — the
    grouped twin of :func:`cms_estimate`. ``probes`` must carry the
    group columns; the sketch side is ≤ d×w rows per group but
    |groups| is data-dependent, so the join is NOT hint-forced — AQE's
    size check broadcasts it at any realistic group count."""
    _assert_keys_clear(keys, {"j", "bucket", "cnt", "cell", "est_n"},
                       "cms_estimate_grouped")
    _assert_keys_clear([key_col], {"j", "bucket", "cnt", "cell", "est_n"},
                       "cms_estimate_grouped", what="key")
    cells = probes.select(
        *keys, key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
    ).select(*keys, key_col, "cell.j", "cell.bucket")
    return (
        cells.join(sketch, [*keys, "j", "bucket"], "left")
        .groupBy(*keys, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )


def cms_merge_grouped(keys: "list[str]",
                      *sketches: DataFrame) -> DataFrame:
    """Per-group cellwise addition — the grouped twin of
    :func:`cms_merge`: counters are linear per (group, j, bucket), so
    epoch builds combine into the union's build without re-reading
    data (property-tested in tests/test_llm.py)."""
    _assert_keys_clear(keys, {"j", "bucket", "cnt"}, "cms_merge_grouped")
    _assert_nonempty(sketches, "cms_merge_grouped", "sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*keys, "j", "bucket")
            .agg(F.sum("cnt").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise addition — sketches are linear, so sketch(A ∪ B) =
    merge(sketch(A), sketch(B)); absent cells count 0."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


# ----------------------------------------------------------- HyperLogLog
HLL_BUCKETS = 64          # m = 2^6: bucket = low 6 bits of the 60-bit hash
HLL_ALPHA = 0.709         # Flajolet et al. 2007's stated constant for m=64
# alpha * m^2 * 2^55 precomputed in Python and inlined as ONE double
# literal so both engines divide the same numerator (the harmonic sum is
# kept scaled by 2^55 in EXACT BIGINT space — see hll_registers)
HLL_NUMERATOR = HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS * float(1 << 55)


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """The m=64 register table (bucket, m) — max leading-zero rank per
    bucket over the 60-bit md5 hash (low 6 bits route, the remaining 54
    are the rank payload). The rank is INTEGER-exact — ``55 -
    length(bin(p))`` with the p=0 all-zeros case pinned to 55 — never a
    float log2, whose boundary rounding could differ across engines.
    One aggregation with key space capped at m cells (same scale shape
    as the CMS counter build: map-side collapse, then a 64-row
    exchange)."""
    hv = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("bigint")
    )
    p = F.shiftright(hv, 6)
    rank = F.when(p == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(p))).cast("int")
    return (
        # NULL keys drop, matching COUNT(DISTINCT)'s NULL semantics —
        # without this a NULL would mint a phantom NULL-bucket register
        df.filter(F.col(key_col).isNotNull())
        .select((hv % HLL_BUCKETS).alias("bucket"), rank.alias("r"))
        .groupBy("bucket").agg(F.max("r").alias("m"))
    )


def hll_registers_grouped(df: DataFrame, keys: "list[str]",
                          key_col: str) -> DataFrame:
    """Per-GROUP register tables ``(keys..., bucket, m)`` — one m=64 HLL
    per key combination in ONE aggregation (the per-tenant distinct-
    count telemetry pattern, the HLL twin of qsketch_build_grouped).
    Keyspace ≤ m cells per group; map-side collapse before the
    exchange; per-group sketches still merge by per-bucket max."""
    _assert_keys_clear(keys, {"bucket", "m", "r"},
                       "hll_registers_grouped")
    _assert_keys_clear([key_col], {"bucket", "m", "r"},
                       "hll_registers_grouped", what="key")
    hv = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("bigint")
    )
    p = F.shiftright(hv, 6)
    rank = F.when(p == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(p))).cast("int")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*keys, (hv % HLL_BUCKETS).alias("bucket"),
                rank.alias("r"))
        .groupBy(*keys, "bucket").agg(F.max("r").alias("m"))
    )


def hll_summary_grouped(registers: DataFrame,
                        keys: "list[str]") -> DataFrame:
    """Per-group ``(keys..., n_buckets, nonzero_regs,
    harmonic_sum_scaled, est_raw)`` — the same exact dyadic harmonic
    sum as :func:`hll_summary`, grouped (the aggregation runs over
    ≤ m register rows per group, never the data)."""
    _assert_keys_clear(
        keys, {"bucket", "m", "n_buckets", "nonzero_regs",
               "harmonic_sum_scaled", "est_raw"}, "hll_summary_grouped")
    m = HLL_BUCKETS
    return registers.groupBy(*keys).agg(
        F.lit(m).cast("int").alias("n_buckets"),
        F.count(F.lit(1)).cast("int").alias("nonzero_regs"),
        (F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m)"))
         + (F.lit(m) - F.count(F.lit(1))).cast("bigint")
         * F.lit(1 << 55).cast("bigint")).alias("harmonic_sum_scaled"),
    ).select(
        *keys, "n_buckets", "nonzero_regs", "harmonic_sum_scaled",
        (F.lit(HLL_NUMERATOR)
         / F.col("harmonic_sum_scaled").cast("double")).alias("est_raw"),
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Registers merge by per-bucket MAX — like the CMS cellwise sum,
    this is what makes the sketch distributable: per-partition/per-day
    register tables combine without re-reading data."""
    return a.unionByName(b).groupBy("bucket").agg(F.max("m").alias("m"))


def hll_merge_grouped(keys: "list[str]",
                      *registers: DataFrame) -> DataFrame:
    """Per-group register merge: grouped HLLs built over disjoint
    epochs combine by per-(group, bucket) MAX into exactly the grouped
    registers of the union — max is idempotent/commutative and
    grouping never perturbs the hash routing, so
    ``merge(build(A), build(B)) ≡ build(A ∪ B)`` register for
    register. The incremental per-tenant distinct-count path: each
    epoch ships ≤ m rows per group, history is never re-read."""
    _assert_keys_clear(keys, {"bucket", "m"}, "hll_merge_grouped")
    _assert_nonempty(registers, "hll_merge_grouped", "register table")
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy(*keys, "bucket").agg(F.max("m").alias("m"))


def hll_summary(registers: DataFrame) -> DataFrame:
    """One row: (n_buckets, nonzero_regs, harmonic_sum_scaled, est_raw).

    The harmonic sum Σ 2^-M_j is kept EXACT: each term is the dyadic
    2^(55-M_j), a BIGINT shift (M_j ≤ 55 ⇒ terms ≤ 2^54, sum < 2^63),
    so no float-summation order hazard exists; absent buckets (M=0)
    contribute 2^55. The only floating-point step is the final single
    division alpha·m²·2^55 / S — IEEE-deterministic given identical
    inputs, so a DuckDB oracle reproduces est_raw bit-for-bit. The
    small-range (linear counting, needs ln) and large-range corrections
    are NOT applied — they would drag a transcendental into the
    cross-engine contract; callers in the correction regimes see the
    raw estimator, documented."""
    m = HLL_BUCKETS
    return registers.agg(
        F.lit(m).cast("int").alias("n_buckets"),
        F.count(F.lit(1)).cast("int").alias("nonzero_regs"),
        (F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - m)"))
         + (F.lit(m) - F.count(F.lit(1))).cast("bigint")
         * F.lit(1 << 55).cast("bigint")).alias("harmonic_sum_scaled"),
    ).select(
        "n_buckets", "nonzero_regs", "harmonic_sum_scaled",
        (F.lit(HLL_NUMERATOR)
         / F.col("harmonic_sum_scaled").cast("double")).alias("est_raw"),
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 ) -> DataFrame:
    """min_j C[j][h_j(key)] per candidate key. The sketch side is ≤
    d×w rows — always broadcast; a key hashing to an untouched cell
    estimates 0 (the left join's NULL → 0, matching an all-zero cell)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
    ).select(key_col, "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
