"""Property-fuzzer lane for the DOUBLE qsketch bucketing (r11).

The exactness claim is sharp: for ANY normal double v, the bucket
lower bound floor(v / 2^(e-B)) * 2^(e-B) must be (a) identical between
the Spark Column builder and its DuckDB SQL twin BIT FOR BIT — the ±1
CASE correction must fully absorb libm log2 rounding on both engines —
and (b) a true mantissa prefix: lo <= v <= lo*(1+2^-B) with lo itself
an exact power-of-two multiple. Hypothesis drives magnitudes across
the whole normal range plus adversarial neighborhoods of powers of two
(where floor(log2) is most likely off by one).
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from drill_calcite_spark.operators.qsketch import (
    QSKETCH_SUB_BITS,
    qsketch_bucket_double_signed,
    sql_qsketch_bucket_double_signed,
)

REL = 2.0 ** -QSKETCH_SUB_BITS


def _next_after(x: float, direction: float) -> float:
    return math.nextafter(x, direction)


_magnitudes = st.one_of(
    # broad normal-range magnitudes (exponents -1022..1023)
    st.floats(min_value=2.0 ** -1022, max_value=1e308,
              allow_nan=False, allow_infinity=False),
    # adversarial: exact powers of two and their ulp neighbors
    st.integers(min_value=-1022, max_value=1023).flatmap(
        lambda k: st.sampled_from([
            2.0 ** k,
            _next_after(2.0 ** k, math.inf),
            _next_after(2.0 ** k, 0.0),
        ])),
    # sub-normal-range (must collapse to the zero cell)
    st.floats(min_value=5e-324, max_value=2.0 ** -1023,
              allow_nan=False, allow_infinity=False),
)

_values = st.lists(
    st.tuples(_magnitudes, st.sampled_from([1.0, -1.0])).map(
        lambda t: t[0] * t[1]),
    min_size=1, max_size=80)


@settings(max_examples=25, deadline=None)
@given(_values)
def test_double_bucket_cross_engine_and_invariants(spark_global, values):
    spark = spark_global
    sdf = spark.createDataFrame([(v,) for v in values], "v double")
    got = {r.v: r.lo for r in sdf.select(
        "v", qsketch_bucket_double_signed(F.col("v")).alias("lo")
    ).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    duck = dict(con.execute(
        f"SELECT v, {sql_qsketch_bucket_double_signed('v')} FROM t"
    ).fetchall())

    for v in values:
        s_lo, d_lo = got[v], duck[v]
        # (a) bit-for-bit cross-engine equality
        assert struct.pack("<d", s_lo) == struct.pack("<d", d_lo), \
            (v, s_lo, d_lo)
        # (b) mantissa-prefix invariants
        if abs(v) < 2.0 ** -1022:
            assert s_lo == 0.0, (v, s_lo)
        elif v > 0:
            assert s_lo <= v <= s_lo * (1 + REL), (v, s_lo)
        else:
            assert s_lo >= v >= s_lo * (1 + REL), (v, s_lo)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
