"""The session-scoped table-plan memo (catalog.read_table /
register_tables, r15): plans are reused within a session, but NOTHING
about results may change — switching scale dirs re-derives, registered
views follow the last-registered scale dir, and memoized plans still
recompute from parquet on every action (they are lazy plans, not data).
"""
from __future__ import annotations

from drill_calcite_spark.catalog import read_table, register_tables

SF_01 = "/root/testdata/sf0.01"
SF_001 = "/root/testdata/sf0.001"


def test_read_table_memo_identity_and_sf_isolation(spark):
    a1 = read_table(spark, SF_01, "orders")
    a2 = read_table(spark, SF_01, "orders")
    assert a1 is a2, "same (session, sf, table) must reuse the lazy plan"
    b = read_table(spark, SF_001, "orders")
    assert b is not a1
    assert a1.count() != b.count(), "scale dirs must stay distinct"


def test_register_tables_follows_scale_dir_switch(spark):
    register_tables(spark, SF_01)
    n_01 = spark.sql("SELECT count(*) c FROM lineitem").collect()[0].c
    register_tables(spark, SF_001)
    n_001 = spark.sql("SELECT count(*) c FROM lineitem").collect()[0].c
    register_tables(spark, SF_01)
    n_back = spark.sql("SELECT count(*) c FROM lineitem").collect()[0].c
    assert n_01 == n_back and n_01 != n_001


def test_memoized_plan_recomputes_not_caches(spark):
    """No storage level may be attached: the memo must never become a
    data cache (the r13 persist() lesson)."""
    df = read_table(spark, SF_01, "orders")
    assert df.storageLevel.useMemory is False
    assert df.storageLevel.useDisk is False
