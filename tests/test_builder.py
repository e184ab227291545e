"""RelBuilder-verb tests (SURVEY.md §3.2): every verb of the fluent Rel API
against hand-computed expectations."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from drill_calcite_spark.plans.builder import Rel, is_not_distinct_from, multiset_eq


def _r(spark, rows, schema):
    return Rel.values(spark, rows, schema)


def test_filter_project_sort_limit(spark):
    r = _r(spark, [(i, i * 2) for i in range(10)], "a long, b long")
    out = (
        r.filter(F.col("a") >= 2)
        .project(F.col("a"), (F.col("b") + 1).alias("b1"))
        .sort_limit(1, 3, F.desc("a"))
        .to_df()
        .collect()
    )
    assert [(x.a, x.b1) for x in out] == [(8, 17), (7, 15), (6, 13)]


def test_aggregate_modes(spark):
    r = _r(spark, [("x", 1), ("x", 2), ("y", 3)], "k string, v long")
    plain = r.aggregate(["k"], F.sum("v").alias("s")).to_df().collect()
    assert sorted((x.k, x.s) for x in plain) == [("x", 3), ("y", 3)]
    rollup = r.aggregate(["k"], F.sum("v").alias("s"), rollup=True).to_df()
    assert rollup.count() == 3  # x, y, grand total
    cube = r.aggregate(["k"], F.sum("v").alias("s"), cube=True).to_df()
    assert cube.count() == 3
    gs = r.aggregate(["k"], F.sum("v").alias("s"),
                     grouping_sets=[["k"], []]).to_df()
    assert gs.count() == 3
    with pytest.raises(ValueError, match="mutually exclusive"):
        r.aggregate(["k"], F.sum("v"), rollup=True, cube=True)


def test_join_types_and_null_safe(spark):
    a = _r(spark, [(1,), (2,), (None,)], "k long")
    b = _r(spark, [(2,), (None,)], "k long")
    assert a.semi_join(b, ["k"]).to_df().count() == 1
    assert a.anti_join(b, ["k"]).to_df().count() == 2  # NULL never equi-matches
    nsafe = a.join(
        b.rename({"k": "k2"}),
        is_not_distinct_from(F.col("k"), F.col("k2")), "inner",
    ).to_df()
    assert nsafe.count() == 2  # 2=2 and NULL<=>NULL


def test_set_ops(spark):
    a = _r(spark, [(1,), (1,), (2,)], "k long")
    b = _r(spark, [(1,), (3,)], "k long")
    assert a.union(b).to_df().count() == 3
    assert a.union(b, all=True).to_df().count() == 5
    assert a.intersect(b).to_df().count() == 1
    assert a.minus(b).to_df().count() == 1
    assert sorted(x.k for x in a.minus(b, all=True).to_df().collect()) == [1, 2]


def test_uncollect_ordinality(spark):
    r = _r(spark, [(1, ["a", "b"])], "k long, arr array<string>")
    out = r.uncollect("arr", ordinality=True, keep=["k"]).to_df().collect()
    assert [(x.k, x.ord, x.elem) for x in out] == [(1, 1, "a"), (1, 2, "b")]


def test_correlate_lateral(spark):
    r = _r(spark, [(2,), (0,)], "n long")
    # NB: F.sequence(1, 0) is a DESCENDING [1, 0], not empty — guard with when()
    series = F.when(F.col("n") > 0, F.sequence(F.lit(1), F.col("n")))
    inner = r.correlate(series, "x").to_df()
    assert sorted((x.n, x.x) for x in inner.collect()) == [(2, 1), (2, 2)]
    left = r.correlate(series, "x", "left").to_df()
    got = sorted(((x.n, x.x) for x in left.collect()), key=str)
    assert got == sorted([(0, None), (2, 1), (2, 2)], key=str)


def test_exchange_distributions(spark):
    r = _r(spark, [(i,) for i in range(100)], "k long")
    assert r.exchange("HASH", "k", num_partitions=8).to_df().rdd.getNumPartitions() == 8
    assert r.exchange("SINGLETON").to_df().rdd.getNumPartitions() == 1
    assert r.exchange("RANGE", "k", num_partitions=4).to_df().rdd.getNumPartitions() == 4
    with pytest.raises(ValueError):
        r.exchange("NOPE")


def test_repeat_union_verb(spark):
    seed = _r(spark, [(1,)], "n long")
    out = seed.repeat_union(
        lambda r: r.filter(F.col("n") < 5).project((F.col("n") + 1).alias("n"))
    ).to_df()
    assert sorted(x.n for x in out.collect()) == [1, 2, 3, 4, 5]


def test_multiset_eq(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["b", "a"]), (["a"], ["b"])],
        "x array<string>, y array<string>",
    )
    got = [r[0] for r in df.select(multiset_eq(F.col("x"), F.col("y"))).collect()]
    assert got == [True, False]


def test_sample_deterministic(spark):
    r = _r(spark, [(i,) for i in range(1000)], "k long")
    s1 = r.sample(0.1, seed=42).to_df().count()
    s2 = r.sample(0.1, seed=42).to_df().count()
    assert s1 == s2 and 0 < s1 < 1000


def test_salted_join_verb(spark):
    fact = _r(spark, [(1, 1.0), (1, 2.0), (2, 3.0)], "k long, v double")
    dim = _r(spark, [(1, "a"), (2, "b")], "k long, s string")
    out = fact.salted_join(dim, ["k"], salts=4).to_df()
    assert sorted(map(tuple, out.collect())) == [(1, 1.0, "a"), (1, 2.0, "a"), (2, 3.0, "b")]


def test_distribution_verb(spark):
    r = _r(spark, [(i, float(i % 7)) for i in range(40)], "k long, v double")
    out = r.distribution(["v", "k"], ntile=4, num_partitions=4).to_df()
    rows = out.select("global_rank", "ntile_bucket").collect()
    assert sorted(x.global_rank for x in rows) == list(range(1, 41))
    from collections import Counter
    sizes = Counter(x.ntile_bucket for x in rows)
    assert sorted(sizes.values()) == [10, 10, 10, 10]


def test_sample_system_verb(spark):
    r = _r(spark, [(i,) for i in range(100)], "k long")
    n = r.sample_system(2, page_rows=10).to_df().count()
    assert 0 < n < 100
