"""ANSI-on session-parity lane.

The driver hands the registry ITS OWN SparkSession, where Spark 4 defaults
apply — notably ``spark.sql.ansi.enabled=true`` — while the engine's own
session (session.py) and therefore the whole classic pytest gate run ANSI
OFF.  Round 8's ``func_geo_srid`` crash (CAST_INVALID_INPUT on a permissive
``cast('' as bigint)``) was structurally invisible to the gate because of
that split.  This lane re-creates the driver's situation: a sibling session
(shared SparkContext, FRESH SQLConf via ``newSession()``) with ANSI forced
ON before every query, then runs every registry entry through the public
``queries()`` surface — whose ``_with_semantics`` wrapper must re-assert the
engine's semantic confs.  Pre-fix code (no wrapper) fails this lane exactly
the way the driver failed CORRECTNESS_r08.

The action is a noop-sink write: it forces FULL evaluation of every output
column JVM-side (``count()`` would let Catalyst prune the very projection
expressions this lane exists to exercise) with zero transfer cost.
"""

from __future__ import annotations

import pytest

from tests.conftest import SMALL_SF_DIR

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """Driver-style sibling session: same JVM/SparkContext, fresh SQLConf."""
    ns = spark.newSession()
    return ns


def _names():
    return list(entrymod.queries())


@pytest.mark.parametrize("name", _names())
def test_registry_runs_under_ansi_session(ansi_spark, name):
    # Re-poison before EVERY query: a prior query's wrapper flipped the
    # conf off (exactly what happens in the driver's long-lived session);
    # each entry must survive being the FIRST one called under ANSI.
    ansi_spark.conf.set("spark.sql.ansi.enabled", "true")
    fn = entrymod.queries()[name]
    df = fn(ansi_spark, SMALL_SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    # the wrapper must have restored engine semantics on this session
    assert ansi_spark.conf.get("spark.sql.ansi.enabled") == "false"


def test_wrapper_restores_all_semantic_confs(ansi_spark):
    from drill_calcite_spark.catalog import _SEMANTIC_CONFS

    ansi_spark.conf.set("spark.sql.ansi.enabled", "true")
    entrymod.queries()["q6_forecast_revenue"](ansi_spark, SMALL_SF_DIR)
    for key, want in _SEMANTIC_CONFS.items():
        assert ansi_spark.conf.get(key) == want, key
