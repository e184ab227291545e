"""Shared helpers for the query registry.

Conventions that keep the DuckDB oracle hash-compatible (driver contract):
- every computed column is aliased identically on both sides;
- float SUMS route through DECIMAL(18,6) (exact, order-independent) and
  display columns round IN DECIMAL, casting to double only after — never
  ``round(x::DOUBLE, n)``, whose half-boundary values the two engines
  round differently (the r7 ``ds_cross_channel_band`` red row; see
  ``r2_dsum``/``r4_davg`` below and tpch3._PS_CTE);
- integer-typed computed outputs are cast to BIGINT on the Spark side because
  DuckDB's extract/count family returns BIGINT;
- result sets under LIMIT carry a total tiebreak ordering so both engines pick
  identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.catalog import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from the scale-factor dir (lazy parquet scan)."""
    return read_table(spark, sf_dir, name)


def ts(literal: str) -> F.Column:
    """A date literal usable against TIMESTAMP columns in both engines."""
    return F.lit(literal).cast("timestamp")


def r2(c: F.Column) -> F.Column:
    return F.round(c, 2)


def r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


def r6(c: F.Column) -> F.Column:
    return F.round(c, 6)


def rz(c: F.Column, n: int) -> F.Column:
    """``round(c, n) + 0.0`` — IEEE ``-0.0 + 0.0 = +0.0`` normalizes the
    signed zero a round of a tiny negative residual produces (e.g.
    ``round(-1e-16, 6)``), which DuckDB keeps as ``-0.0`` while Spark
    emits ``+0.0`` — the r8 ``func_geo_concave`` hash-red class. Use on
    every difference-of-measures DISPLAY column; the ``+ 0.0`` is exact
    for every other value. SQL twin: ``sql_rz``."""
    return F.round(c, n) + F.lit(0.0)


def sql_rz(expr: str, n: int) -> str:
    """DuckDB twin of ``rz``."""
    return f"(round({expr}, {n}) + 0.0)"


def r2_dsum(c: F.Column) -> F.Column:
    """``round(sum(c), 2)`` with the sum carried in DECIMAL(18,6) and the
    rounding done IN DECIMAL before the double cast — exact and
    order-independent, so the driver's value hash cannot diverge on a
    half-cent boundary or on double summation order (the r8 hardening
    sweep; both engines round DECIMAL half-away-from-zero identically).
    SQL twin: ``round(sum((expr)::DECIMAL(18,6)), 2)::DOUBLE``."""
    return F.round(F.sum(c.cast("decimal(18,6)")), 2).cast("double")


def sql_r2_dsum(expr: str) -> str:
    """DuckDB twin of ``r2_dsum``."""
    return f"round(sum(({expr})::DECIMAL(18,6)), 2)::DOUBLE"


def r4_davg(c: F.Column) -> F.Column:
    """``round(avg(c), 4)`` computed EXACTLY for non-negative ``c``: the
    DECIMAL(18,6) sum becomes integer micros m, the count q, and the
    half-up 4-dp quotient is ``(2·m·10⁴ + q·10⁶) div (2·q·10⁶)`` — no
    double arithmetic anywhere before the final exact /10⁴, so both
    engines agree even when the true average sits on a .xxxx5 boundary
    (the r7 divergence class, at avg granularity). Spark ``div`` and
    DuckDB ``//`` both truncate toward zero = floor for these
    non-negative operands. SQL twin: ``sql_r4_davg``."""
    m = (F.sum(c.cast("decimal(18,6)")) * F.lit(1000000)) \
        .cast("decimal(38,0)")
    q = F.count(c).cast("decimal(38,0)")
    ten4 = F.call_function(
        "div", F.lit(2) * m * F.lit(10000) + q * F.lit(1000000),
        F.lit(2) * q * F.lit(1000000))
    return ten4 / F.lit(10000.0)


def sql_r4_davg(expr: str) -> str:
    """DuckDB twin of ``r4_davg`` (same integer half-up form)."""
    return (f"(((2 * CAST(sum(({expr})::DECIMAL(18,6)) * 1000000 AS "
            f"HUGEINT) * 10000 + count({expr}) * 1000000) "
            f"// (2 * count({expr}) * 1000000)) / 10000.0)")
