"""Epoch/time integer helpers with FLOOR (not truncate) semantics.

Reference parity: Calcite's datetime arithmetic floors toward negative
infinity (DateTimeUtils.floorDiv in avatica, used by
core/.../runtime/SqlFunctions.java datetime helpers), as do DuckDB's
``//`` and ``%``-then-``//`` idioms the oracles use. A ``/`` + BIGINT
cast in Spark truncates toward zero instead, which diverges on pre-1970
(negative-epoch) timestamps by exactly one unit. These helpers keep all
epoch math in exact integer space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(ts: Column | str) -> Column:
    """Exact microseconds since epoch (matches DuckDB ``epoch_us``),
    including pre-1970 timestamps — no string round-trips."""
    return F.unix_micros(F.col(ts) if isinstance(ts, str) else ts)


def floor_div(col: Column, n: int) -> Column:
    """Integer floor division ``col // n`` for BIGINT columns.

    ``pmod`` returns the non-negative remainder, so ``col - pmod(col, n)``
    is the exact floor multiple; the final divide is exact (the numerator
    is a multiple of ``n``) and stays within double's 2^53 mantissa for
    any epoch-micros magnitude after the division."""
    return ((col - F.pmod(col, F.lit(n))) / F.lit(n)).cast("bigint")
