"""Driver-mimicking gate: every queries() entry that declares an oracle must
match DuckDB at sf0.01 (BASELINE.md t2) with EXACT float equality (after
-0.0/NaN normalization) — at least as strict as the driver's value hash, so
green here ⇒ green in CORRECTNESS_r{N}.json.  (Until round 8 this gate
quietly tolerated rel_tol=1e-6 and missed the ds_cross_channel_band half-cent
divergence the driver flagged; see conftest._rows_close.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle

import __spark_entry__ as entrymod


def _cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in qs if name in oracles]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    assert_matches_oracle(fn(spark, SF_DIR), duck, sql)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if name not in oracles:
            df = fn(spark, SF_DIR)
            assert df.columns, f"{name} returned no columns"
            assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
