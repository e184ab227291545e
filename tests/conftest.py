from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drill_calcite_spark.catalog import TABLES, table_path
from drill_calcite_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SMALL_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="drill_calcite_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(SF_DIR, name)
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # NO -0.0 normalization: the driver's value hash distinguishes the
        # zero's sign bit (the r8 func_geo_concave red row — 13 cells
        # differing ONLY in -0.0 vs +0.0 passed this gate while the driver
        # hashed red). Queries normalize signed zeros THEMSELVES via the
        # `round(...) + 0.0` spelling in both twins (common.rz).
        return v
    return v


def _norm_rows(cols, rows):
    """Sort columns by name then rows — mirrors the driver's order-insensitive
    value-hash comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def assert_matches_oracle(spark_df, duck_con, sql, check_names=True):
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    s_cols = list(sdf.columns)
    d_cols = list(ddf.columns)
    if check_names:
        assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
    d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    _, s_norm = _norm_rows(s_cols, s_rows)
    _, d_norm = _norm_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert _rows_close(a, b), (
            f"row {i} differs:\n spark={a}\n duck ={b}"
            + ("\n (values are within 1e-6 — an engine rounding divergence "
               "the driver's exact hash WOULD flag; round in DECIMAL space "
               "before any double cast, see tpch3._PS_CTE)"
               if _rows_close(a, b, tol=1e-6) else "")
        )


def _rows_close(a, b, tol=0.0):
    """Row comparison for the oracle-parity gate.

    STRICT by default (tol=0.0): floats must be bit-equal (after the
    NaN normalization in ``_norm_cell``; signed zeros are DISTINCT since
    r9), matching the driver's exact value-hash.  The round-7 red row ``ds_cross_channel_band`` was
    a 1-cent divergence on a 600k value (1.7e-8 relative) — invisible to
    the old blanket rel_tol=1e-6, red to the driver; this gate must be
    at least as strict as the driver or its green proves nothing.  The
    tolerant form survives only as a failure-message diagnostic above.
    """
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if tol == 0.0:
                # bit-equal: Python's == treats -0.0 == +0.0, the driver's
                # hash does not — compare the sign bit explicitly.
                if x != y or (x == 0.0
                              and math.copysign(1.0, x)
                              != math.copysign(1.0, y)):
                    return False
            elif not math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                return False
        elif hasattr(x, "timestamp") and hasattr(y, "timestamp"):
            if str(x) != str(y):
                return False
        else:
            if x != y:
                if str(x) != str(y):
                    return False
    return True
