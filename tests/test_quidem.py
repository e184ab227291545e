"""Replay the reference's own quidem conformance cases (tests/iq/*.iq)
against the engine's Calcite-dialect SQL front door.

Corpus provenance: every case in tests/iq/ is copied VERBATIM (SQL +
expected result table) from the reference's end-to-end scripts
core/src/test/resources/sql/*.iq (Apache Calcite, Apache-2.0) — the
source file:line is recorded above each case. These are conformance
DATA — queries plus the answers the reference itself prints — used here
exactly as BASELINE.md prescribes: hold this engine to the reference's
results on the reference's own test queries. See tests/iq/README.md for
the selection and exclusion criteria.

Execution path: drill_calcite_spark.sql.calcite_sql (the dialect
rewrites are part of the product surface: nulls-high default collation,
LISTAGG default separator, FLOOR-to-unit), over the POST + Scott
fixtures of sources/test_schemas.py.
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.quidem import assert_rows_match, parse_iq

_IQ_DIR = os.path.join(os.path.dirname(__file__), "iq")


def _all_cases():
    cases = []
    for path in sorted(glob.glob(os.path.join(_IQ_DIR, "*.iq"))):
        cases.extend(parse_iq(path))
    return cases


_CASES = _all_cases()


@pytest.fixture(scope="module")
def quidem_schemas(spark):
    from drill_calcite_spark.functions.geo_sqlfn import register_geo_sql
    from drill_calcite_spark.sources.test_schemas import (
        register_catchall,
        register_geo,
        register_hr,
        register_post,
        register_scott,
    )

    register_post(spark)
    register_scott(spark)
    register_hr(spark)
    register_catchall(spark)
    register_geo(spark)
    register_geo_sql(spark)
    yield


# per-file count of already-executed setup statements (blank.iq's
# create-table/insert preludes run once, in order, as cases need them)
_SETUPS_DONE: dict[str, int] = {}


def _run_setups(spark, case):
    import re

    setups = case.get("setup") or ()
    done = _SETUPS_DONE.get(case["file"], 0)
    for stmt in setups[done:]:
        m = re.match(r"\s*create\s+table\s+(\w+)", stmt, re.I)
        if m:
            # idempotent re-create into the scratch warehouse; Spark's
            # v1 parquet tables reject column NOT NULL constraints
            spark.sql(f"DROP TABLE IF EXISTS {m.group(1)}")
            stmt = re.sub(r"\s+not\s+null\b", "", stmt, flags=re.I)
        spark.sql(stmt)
    _SETUPS_DONE[case["file"]] = max(done, len(setups))


@pytest.mark.parametrize(
    "case", _CASES, ids=[f'{c["file"]}:{c["line"]}' for c in _CASES])
def test_quidem_case(spark, quidem_schemas, case):
    from drill_calcite_spark.sql import calcite_sql

    _run_setups(spark, case)
    df = calcite_sql(spark, case["sql"],
                     schema_views={"scott": "scott_", "hr": "hr_",
                                   "GEO": "geo_"})
    got = df.limit(2000).collect()
    assert_rows_match(got, case["rows"], f'{case["file"]}:{case["line"]}')


def test_corpus_is_nonempty():
    assert len(_CASES) >= 445, f"quidem corpus shrank: {len(_CASES)} cases"
