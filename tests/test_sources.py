"""Unit tests for file sources (schema-on-read conformance) and the
copy-on-write TableModify implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from drill_calcite_spark.sources.files import (
    conform_to,
    read_csv_inferred,
)
from drill_calcite_spark.sources.modify import (
    create_table,
    delete_where,
    insert_into,
    merge_into,
    read_versioned,
    update_where,
)


def test_csv_schema_on_read_and_conform(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k long, s string, v double"
    )
    p = str(tmp_path / "csv")
    df.coalesce(1).write.option("header", "true").csv(p)
    back = read_csv_inferred(spark, p)
    # inference may pick int over long; conform_to must fix types + order
    fixed = conform_to(back.select("v", "s", "k"), df.schema)
    assert fixed.schema == df.schema
    assert sorted(map(tuple, fixed.collect())) == sorted(map(tuple, df.collect()))


def test_conform_fills_missing_columns(spark):
    df = spark.createDataFrame([(1,)], "k long")
    target = spark.createDataFrame([(1, "x")], "k long, extra string").schema
    out = conform_to(df, target)
    row = out.collect()[0]
    assert row.k == 1 and row.extra is None


def test_cow_insert_delete_update(spark, tmp_path):
    p = str(tmp_path / "tbl")
    create_table(spark, p, spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"))
    insert_into(spark, p, spark.createDataFrame([(3, "c")], "k long, s string"))
    assert read_versioned(spark, p).count() == 3
    delete_where(spark, p, F.col("k") == 1)
    update_where(spark, p, F.col("k") == 2, {"s": F.lit("B")})
    rows = sorted(map(tuple, read_versioned(spark, p).collect()))
    assert rows == [(2, "B"), (3, "c")]


def test_cow_merge_matched_and_insert(spark, tmp_path):
    p = str(tmp_path / "tbl")
    create_table(
        spark, p,
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double"),
    )
    src = spark.createDataFrame([(2, 5.0), (9, 99.0)], "k long, delta double")
    merge_into(
        spark, p, src, on=["k"],
        when_matched_update={"bal": F.col("__tgt.bal") + F.col("__src.delta")},
        when_not_matched_insert=False,
    )
    assert dict(map(tuple, read_versioned(spark, p).collect())) == {1: 10.0, 2: 25.0}
    # now with insert: unmatched source key 9 arrives with NULL-filled cols
    src2 = spark.createDataFrame([(9, 1.0)], "k long, bal double")
    merge_into(spark, p, src2, on=["k"], when_not_matched_insert=True)
    got = dict(map(tuple, read_versioned(spark, p).collect()))
    assert got == {1: 10.0, 2: 25.0, 9: 1.0}


def test_cow_merge_duplicate_source_keys_raise(spark, tmp_path):
    # SQL MERGE errors when a target row matches multiple source rows;
    # silent fan-out would duplicate target rows.
    import pytest

    p = str(tmp_path / "tbl")
    create_table(spark, p, spark.createDataFrame([(1, 10.0)], "k long, bal double"))
    dup_src = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k long, delta double")
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(spark, p, dup_src, on=["k"],
                   when_matched_update={"bal": F.col("__src.delta")})


def test_cow_merge_duplicate_unmatched_keys_insert(spark, tmp_path):
    # Duplicate source keys that match NO target row are legal SQL MERGE:
    # each fires WHEN NOT MATCHED independently (one insert per source row).
    p = str(tmp_path / "tbl")
    create_table(spark, p, spark.createDataFrame([(1, 10.0)], "k long, bal double"))
    dup_src = spark.createDataFrame(
        [(9, 1.0), (9, 2.0)], "k long, bal double"
    )
    merge_into(spark, p, dup_src, on=["k"], when_not_matched_insert=True)
    rows = sorted(map(tuple, read_versioned(spark, p).collect()))
    assert rows == [(1, 10.0), (9, 1.0), (9, 2.0)]


def test_cow_merge_on_column_named_count(spark, tmp_path):
    # An ON column literally named 'count' must not collide with the
    # duplicate-key guard's aggregate alias.
    p = str(tmp_path / "tbl")
    create_table(
        spark, p, spark.createDataFrame([(1, 10.0)], "count long, bal double")
    )
    src = spark.createDataFrame([(1, 5.0)], "count long, delta double")
    merge_into(spark, p, src, on=["count"],
               when_matched_update={"bal": F.col("__src.delta")})
    assert dict(map(tuple, read_versioned(spark, p).collect())) == {1: 5.0}


def test_cow_snapshot_previous_version(spark, tmp_path):
    p = str(tmp_path / "tbl")
    create_table(spark, p, spark.createDataFrame([(i,) for i in range(5)], "k long"))
    delete_where(spark, p, F.col("k") < 2)
    assert read_versioned(spark, p).count() == 3
    assert read_versioned(spark, p, version=0).count() == 5


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    # write over JDBC into embedded Derby, read back with a 3-way
    # range-partitioned scan; data and types survive the roundtrip
    from drill_calcite_spark.sources.jdbc import derby_url, jdbc_read, jdbc_write

    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(10)],
        "k long, s string, v double",
    )
    db = str(tmp_path / "derbydb")
    jdbc_write(df, derby_url(db, create=True), "t1",
               column_types="s VARCHAR(32)")
    back = jdbc_read(spark, derby_url(db), "t1",
                     partition_on="k", lower=0, upper=10, num_partitions=3)
    assert back.rdd.getNumPartitions() == 3
    rows = sorted(map(tuple, back.collect()))
    assert rows == [(i, f"name{i}", i * 1.5) for i in range(10)]
    # pushdown subquery form (Derby folds unquoted identifiers to upper
    # case while Spark writes quoted lower-case columns — quote them)
    sub = jdbc_read(spark, derby_url(db),
                    '(SELECT "k", "v" FROM t1 WHERE "k" < 3) s')
    assert sorted(map(tuple, sub.collect())) == [(0, 0.0), (1, 1.5), (2, 3.0)]


def test_html_table_roundtrip_escapes_markup(spark, tmp_path):
    """Cells containing HTML markup characters must round-trip through
    the &-escaping (FileReader.java parses entities the same way)."""
    from drill_calcite_spark.sources.files import (
        ensure_html_copy, read_html_table)

    df = spark.createDataFrame(
        [(1, "a < b & c > d"), (2, "<td>nested</td>"), (3, "plain")],
        "id int, s string")
    path = str(tmp_path / "html_tbl")
    ensure_html_copy(spark, df, path)
    back = read_html_table(spark, path, ["id", "s"])
    got = sorted((int(r.id), r.s) for r in back.collect())
    assert got == [(1, "a < b & c > d"), (2, "<td>nested</td>"), (3, "plain")]


def test_version_diff_roundtrip_reconstructs(spark, tmp_path):
    """Applying the change feed to the old version must reconstruct the
    new one exactly (multiset): v0 − deletes + inserts ≡ v1 — the
    invariant that makes a CDC feed usable by downstream consumers."""
    from pyspark.sql import functions as F

    from drill_calcite_spark.sources.modify import (
        create_table,
        delete_where,
        insert_into,
        read_versioned,
        version_diff,
    )

    df = spark.createDataFrame(
        [(i, i % 3, f"v{i % 5}") for i in range(50)] + [(7, 1, "v2")],
        "k int, g int, s string")  # includes a duplicate row (k=7)
    path = str(tmp_path / "cdc_tbl")
    create_table(spark, path, df)
    delete_where(spark, path, F.col("g") == 1)
    insert_into(spark, path, spark.createDataFrame(
        [(100, 9, "new"), (100, 9, "new")], "k int, g int, s string"))
    diff = version_diff(spark, path, 1, 2)
    v1 = read_versioned(spark, path, 1)
    v2 = read_versioned(spark, path, 2)
    ins = diff.filter(F.col("_change") == "insert").drop("_change")
    dels = diff.filter(F.col("_change") == "delete").drop("_change")
    rebuilt = v1.exceptAll(dels).unionByName(ins)
    assert rebuilt.exceptAll(v2).count() == 0
    assert v2.exceptAll(rebuilt).count() == 0
    # the duplicate insert must appear twice in the feed (multiset)
    assert ins.filter(F.col("k") == 100).count() == 2
