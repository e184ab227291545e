"""Unit tests for the custom operators with hand-computed goldens —
the reference's operator-semantics test layer (SURVEY.md §5 layer 2)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from drill_calcite_spark.functions.pattern import similar_to_regex
from drill_calcite_spark.operators import asof_join, match_recognize, repeat_union, snapshot
from drill_calcite_spark.operators.match_recognize import _find_matches, _parse_pattern


# --------------------------------------------------------------- SIMILAR TO
def test_similar_to_regex_translation():
    import re as _re

    def m(pat, s, escape=None):
        return bool(_re.match(similar_to_regex(pat, escape), s))

    # % and _ wildcards, anchored whole-string match
    assert m("a%", "abc") and m("a%", "a") and not m("a%", "xa")
    assert m("a_c", "abc") and not m("a_c", "ac") and not m("a_c", "abbc")
    # regex operators ARE SIMILAR TO operators
    assert m("(ab|cd)+", "abcdab") and not m("(ab|cd)+", "abx")
    assert m("[a-c]%", "beta") and not m("[a-c]%", "delta")
    assert m("[^x]*", "abc") and not m("[^x]*", "axc")
    assert m("a{2,3}b", "aab") and m("a{2,3}b", "aaab") and not m("a{2,3}b", "ab")
    # regex metacharacters that are LITERALS in SIMILAR TO
    assert m("a.c", "a.c") and not m("a.c", "axc")
    assert m("x^y$z", "x^y$z")
    # ESCAPE clause makes operators literal
    assert m(r"100\%", "100%", escape="\\") and not m(r"100\%", "1000", escape="\\")
    assert m("a!_b", "a_b", escape="!") and not m("a!_b", "axb", escape="!")
    with pytest.raises(ValueError):
        similar_to_regex("abc!", escape="!")
    with pytest.raises(ValueError):
        similar_to_regex("[abc")


def test_similar_to_brace_validation():
    import re as _re

    # well-formed quantifiers translate and compile
    assert _re.match(similar_to_regex("a{2}"), "aa")
    assert _re.match(similar_to_regex("a{2,}"), "aaaa")
    assert not _re.match(similar_to_regex("a{2,3}"), "a")
    # escaped braces are literals
    assert _re.match(similar_to_regex("a!{b", escape="!"), "a{b")
    # stray/malformed braces fail at TRANSLATE time (SQL:2003 invalid
    # pattern), not later inside the regex engine
    for bad in ("a{b", "a}", "{2}", "a{,2}", "a{2,3", "a{"):
        with pytest.raises(ValueError):
            similar_to_regex(bad)


# ------------------------------------------------------------ pattern matcher
def _runs(seq, pattern, skip_past=True):
    """seq: string per row of applicable symbols, e.g. ['S','SD','SU']."""
    symrows = [set(s) for s in seq]
    skip = ("past_last",) if skip_past else ("next_row",)
    return _find_matches(symrows, _parse_pattern(pattern), skip)


def test_nfa_greedy_plus():
    # rows: S=always, D=down, U=up
    seq = ["S", "SD", "SD", "SU", "SU", "S"]
    m = _runs(seq, "S D+ U+")
    assert len(m) == 1
    assert m[0]["*"] == [0, 1, 2, 3, 4]
    assert m[0]["D"] == [1, 2] and m[0]["U"] == [3, 4]


def test_nfa_skip_past_last_row_vs_next_row():
    seq = ["S", "SD", "SU", "SD", "SU"]
    past = _runs(seq, "S D+ U+", skip_past=True)
    assert [m["*"] for m in past] == [[0, 1, 2]]  # rows 3.. can't restart (row3 is S too)
    nxt = _runs(seq, "S D+ U+", skip_past=False)
    # skip-to-next-row finds overlapping matches starting at rows 0 and 2
    assert [m["*"] for m in nxt] == [[0, 1, 2], [2, 3, 4]]


def test_nfa_quantifier_bounds_and_alternation():
    seq = ["A", "A", "A", "B"]
    m = _runs(seq, "A{2,3} B")
    assert m[0]["A"] == [0, 1, 2]
    m2 = _runs(["X", "B"], "A B | X B")
    assert m2[0]["*"] == [0, 1]


def test_nfa_optional_and_star():
    m = _runs(["A", "C"], "A B? C")
    assert m[0]["*"] == [0, 1]
    m = _runs(["A", "B", "B", "C"], "A B* C")
    assert m[0]["*"] == [0, 1, 2, 3]


def test_nfa_backtracking_greedy_gives_up_rows():
    # B+ must backtrack: all rows match B, but trailing C needs the last row
    seq = ["BC", "BC", "BC"]
    m = _runs(seq, "B+ C")
    assert m[0]["B"] == [0, 1] and m[0]["C"] == [2]


def test_match_recognize_e2e(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0),
         (2, 1, 5.0), (2, 2, 7.0)],
        "uid long, seq long, value double",
    )
    out = match_recognize(
        df, ["uid"], ["seq"],
        pattern="STRT DOWN+ UP+",
        define={
            "STRT": lambda p: pd.Series(True, index=p.index),
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={
            "uid": lambda p, m: int(p["uid"].iloc[0]),
            "start_seq": lambda p, m: int(p["seq"].iloc[m["*"][0]]),
            "bottom": lambda p, m: float(p["value"].iloc[m["DOWN"][-1]]),
            "end_seq": lambda p, m: int(p["seq"].iloc[m["*"][-1]]),
        },
        output_schema="uid long, start_seq long, bottom double, end_seq long",
    ).collect()
    assert [tuple(r) for r in out] == [(1, 1, 6.0, 5)]


def test_match_recognize_all_rows_subset(spark):
    # uid 1: 10 8 6 9 11 7 → V at rows 1-4 (DOWN 8,6; UP 9,11), then 7 is
    # DOWN with no UP after → no second match. uid 2: strictly up → none.
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0),
         (1, 6, 7.0), (2, 1, 5.0), (2, 2, 7.0)],
        "uid long, seq long, value double",
    )
    out = match_recognize(
        df, ["uid"], ["seq"],
        pattern="DOWN+ UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={
            "bottom": lambda p, m: float(p["value"].iloc[m["DOWN"][-1]]),
            "n_vv": lambda p, m: len(m["VV"]),
        },
        output_schema=(
            "uid long, seq long, classifier string, match_no long, "
            "bottom double, n_vv long"
        ),
        rows_per_match="all",
        subset={"VV": ["DOWN", "UP"]},
    ).collect()
    rows = sorted((r.uid, r.seq, r.classifier, r.match_no, r.bottom, r.n_vv)
                  for r in out)
    assert rows == [
        (1, 2, "DOWN", 1, 6.0, 4),
        (1, 3, "DOWN", 1, 6.0, 4),
        (1, 4, "UP", 1, 6.0, 4),
        (1, 5, "UP", 1, 6.0, 4),
    ]


def test_match_recognize_all_rows_two_matches_numbered(spark):
    # two disjoint Vs in one partition → match_no 1 and 2
    df = spark.createDataFrame(
        [(1, i + 1, v) for i, v in enumerate([5.0, 3.0, 6.0, 9.0, 4.0, 8.0])],
        "uid long, seq long, value double",
    )
    out = match_recognize(
        df, ["uid"], ["seq"],
        pattern="DOWN+ UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={},
        output_schema="seq long, match_no long, classifier string",
        rows_per_match="all",
    ).collect()
    rows = sorted((r.seq, r.match_no, r.classifier) for r in out)
    assert rows == [(2, 1, "DOWN"), (3, 1, "UP"), (4, 1, "UP"),
                    (5, 2, "DOWN"), (6, 2, "UP")]


# Plain pattern characters: no SIMILAR TO operators, no newlines (regex '.'
# excludes line terminators in Java, RE2 and Python alike — engine-faithful).
_PLAIN = __import__("hypothesis").strategies.text(
    alphabet=__import__("hypothesis").strategies.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="%_[]()|*+?{}\\\n\r",
    ),
    max_size=20,
)


@__import__("hypothesis").given(_PLAIN)
def test_similar_to_plain_pattern_is_exact_literal(s):
    # every non-operator character — including regex metachars . ^ $ —
    # must match itself and nothing else
    import re as _re

    rx = _re.compile(similar_to_regex(s))
    assert rx.match(s)
    if s:
        assert not rx.match(s + "x") and not rx.match("x" + s)


@__import__("hypothesis").given(_PLAIN, _PLAIN)
def test_similar_to_percent_absorbs_any_suffix(a, b):
    import re as _re

    assert _re.compile(similar_to_regex(a + "%")).match(a + b)


@__import__("hypothesis").given(_PLAIN)
def test_similar_to_underscore_is_exactly_one_char(s):
    import re as _re

    rx = _re.compile(similar_to_regex(s + "_"))
    assert rx.match(s + "x")
    assert not rx.match(s)
    assert not rx.match(s + "xy")


def test_nfa_permute_expands_all_orderings():
    # PERMUTE(A, B) ≡ (A B | B A), preference in permutation order
    seq = ["B", "A"]  # row0 only B, row1 only A
    m = _runs(seq, "PERMUTE(A, B)")
    assert len(m) == 1 and m[0]["B"] == [0] and m[0]["A"] == [1]
    seq2 = ["A", "B"]
    m2 = _runs(seq2, "PERMUTE(A, B)")
    assert len(m2) == 1 and m2[0]["A"] == [0] and m2[0]["B"] == [1]
    # quantifiers survive inside PERMUTE
    m3 = _runs(["A", "A", "B"], "PERMUTE(A+, B)")
    assert len(m3) == 1 and m3[0]["A"] == [0, 1] and m3[0]["B"] == [2]


def test_nfa_exclusion_rows_marked():
    seq = ["S", "SD", "SU"]
    m = _runs(seq, "S {- D -} U")
    assert len(m) == 1
    assert m[0]["*"] == [0, 1, 2]  # D row still matched...
    assert m[0]["-"] == [1]        # ...but marked excluded


def test_match_recognize_all_rows_exclusion(spark):
    # ALL ROWS PER MATCH with {- DOWN -}: the down-leg rows are matched
    # (present in measures) but withheld from the output
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 6.0), (1, 4, 9.0), (1, 5, 11.0)],
        "uid long, seq long, value double",
    )
    out = match_recognize(
        df, ["uid"], ["seq"],
        pattern="{- DOWN+ -} UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={"n_matched": lambda p, m: len(m["*"])},
        output_schema="seq long, classifier string, n_matched long",
        rows_per_match="all",
    ).collect()
    rows = sorted((r.seq, r.classifier, r.n_matched) for r in out)
    # DOWN rows 2,3 matched (n_matched=4) but only UP rows 4,5 output
    assert rows == [(4, "UP", 4), (5, "UP", 4)]


def test_match_recognize_within_interval(spark):
    # same V-shape twice; the second is stretched over a long time span and
    # must be rejected by WITHIN 10 (rel/core/Match.java interval)
    df = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 2.0, 8.0), (1, 4.0, 9.0),      # span 4 → kept
         (2, 0.0, 10.0), (2, 50.0, 8.0), (2, 99.0, 9.0)],   # span 99 → dropped
        "uid long, t double, value double",
    )
    kwargs = dict(
        partition_by=["uid"], order_by=["t"],
        pattern="DOWN+ UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={"uid": lambda p, m: int(p["uid"].iloc[0]),
                  "n": lambda p, m: len(m["*"])},
        output_schema="uid long, n long",
    )
    out = match_recognize(df, within=("t", 10.0), **kwargs).collect()
    assert [(r.uid, r.n) for r in out] == [(1, 2)]
    # without the clause both matches survive
    out2 = match_recognize(df, **kwargs).collect()
    assert sorted((r.uid, r.n) for r in out2) == [(1, 2), (2, 2)]


def test_match_recognize_within_backtracks_to_shorter_match(spark):
    # greedy UP+ would span 50s and bust WITHIN 10 — the matcher must fall
    # back to the shorter UP prefix that qualifies, not drop the match
    df = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 2.0, 8.0), (1, 4.0, 9.0), (1, 50.0, 11.0)],
        "uid long, t double, value double",
    )
    out = match_recognize(
        df, ["uid"], ["t"], pattern="DOWN+ UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={"uid": lambda p, m: int(p["uid"].iloc[0]),
                  "n": lambda p, m: len(m["*"]),
                  "last_t": lambda p, m: float(p["t"].iloc[m["*"][-1]])},
        output_schema="uid long, n long, last_t double",
        within=("t", 10.0),
    ).collect()
    assert [(r.uid, r.n, r.last_t) for r in out] == [(1, 2, 4.0)]


def test_salted_join_rejects_build_preserving_how(spark):
    from drill_calcite_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 1.0)], "k long, v double")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(fact, dim, ["k"], salts=4, how=how)
    # anti/semi are fact-preserving and must work
    assert salted_join(fact, dim, ["k"], salts=4, how="left_semi").count() == 1
    assert salted_join(fact, dim, ["k"], salts=4, how="left_anti").count() == 0


def test_distributed_distribution_handles_ties(spark):
    from pyspark.sql import Window as W

    from drill_calcite_spark.operators.ranks import distributed_distribution

    # heavy ties: only 7 distinct order keys over 40 rows
    df = spark.createDataFrame([(i, i % 7) for i in range(40)], "id long, v long")
    got = distributed_distribution(df, ["v"], ntile=4, num_partitions=4)
    w = W.orderBy("v")
    exp = df.select(
        "id", "v",
        F.rank().over(w).alias("global_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.percent_rank().over(w).alias("percent_rank"),
    )
    g = {r.id: (r.global_rank, r.cume_dist, r.percent_rank)
         for r in got.collect()}
    for r in exp.collect():
        gr, cd, pr = g[r.id]
        assert gr == r.global_rank, (r.id, gr, r.global_rank)
        assert abs(cd - r.cume_dist) < 1e-12
        assert abs(pr - r.percent_rank) < 1e-12
    # NTILE is row-based: bucket sizes must be exactly n/k regardless of ties
    sizes = sorted(
        r["cnt"] for r in got.groupBy("ntile_bucket")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    assert sizes == [10, 10, 10, 10]


def test_epoch_floor_division_pre1970(spark):
    from drill_calcite_spark.functions.time import epoch_micros, floor_div

    df = spark.createDataFrame(
        [("1969-12-31 23:59:59.5",), ("1970-01-01 00:00:00.5",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    rows = df.select(
        epoch_micros("ts").alias("us"),
        floor_div(epoch_micros("ts"), 1_000_000).alias("sec"),
    ).orderBy("us").collect()
    # pre-1970: -0.5s floors to -1 (a truncate-toward-zero would give 0)
    assert [(r.us, r.sec) for r in rows] == [(-500000, -1), (500000, 0)]
    neg = spark.range(1).select(floor_div(F.lit(-1500001), 1000).alias("x"))
    assert neg.collect()[0].x == -1501


def test_salted_join_equals_plain_join(spark):
    from drill_calcite_spark.operators.skew import salted_join

    # planted skew: 90% of fact rows share one key
    fact = spark.createDataFrame(
        [(1 if i % 10 else i % 5, float(i)) for i in range(2000)], "k long, v double"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "k long, name string")
    salted = salted_join(fact, dim, ["k"], salts=7)
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left joins preserve unmatched fact rows too
    fact2 = fact.union(spark.createDataFrame([(99, 0.0)], "k long, v double"))
    sl = salted_join(fact2, dim, ["k"], salts=3, how="left")
    pl = fact2.join(dim, "k", "left")
    assert sorted(map(tuple, sl.collect()), key=str) == sorted(map(tuple, pl.collect()), key=str)


def test_new_operators_empty_input(spark):
    # zero-row inputs must yield zero-row outputs, not crashes
    from drill_calcite_spark.operators.ranks import distributed_distribution
    from drill_calcite_spark.operators.skew import salted_join

    empty = spark.createDataFrame([], "k long, v double")
    dim = spark.createDataFrame([(1, "a")], "k long, s string")
    assert salted_join(empty, dim, ["k"], salts=3).count() == 0
    assert distributed_distribution(empty, ["v", "k"], ntile=4,
                                    num_partitions=4).count() == 0
    from drill_calcite_spark.operators.match_recognize import match_recognize

    out = match_recognize(
        spark.createDataFrame([], "uid long, seq long, value double"),
        ["uid"], ["seq"], pattern="D+",
        define={"D": lambda p: p["value"] < 0},
        measures={"n": lambda p, m: len(m["*"])},
        output_schema="n long", rows_per_match="all",
    )
    assert out.count() == 0
    from drill_calcite_spark.operators.graph import pagerank
    from drill_calcite_spark.operators.similarity import cosine_topk_blocked

    evec = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_topk_blocked(evec, evec, "vec_id", "embedding").count() == 0
    eedge = spark.createDataFrame([], "src long, dst long")
    assert pagerank(eedge).count() == 0


def test_pagerank_mass_conservation_and_determinism(spark):
    from drill_calcite_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 10) for i in range(10)]
        + [(i, (i * 7 + 2) % 10) for i in range(10)],
        "src long, dst long",
    )
    r1 = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    r2 = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert r1 == r2  # bit-identical across runs
    # no dangling nodes in this graph → total rank mass stays 1
    assert abs(sum(r1.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in r1.values())


# ------------------------------------------------------------ distributed ranks
def test_distributed_distribution_matches_global_window(spark):
    from pyspark.sql import Window as W

    from drill_calcite_spark.operators.ranks import distributed_distribution

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(1, 104)], "k long, v double"
    )
    got = distributed_distribution(df, ["v", "k"], ntile=4, num_partitions=8)
    w = W.orderBy("v", "k")
    ref = df.select(
        "k",
        F.row_number().over(w).cast("bigint").alias("global_rank"),
        F.ntile(4).over(w).alias("ntile_bucket"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.percent_rank().over(w).alias("percent_rank"),
    )
    g = {r.k: (r.global_rank, r.ntile_bucket, round(r.cume_dist, 9),
               round(r.percent_rank, 9)) for r in got.collect()}
    e = {r.k: (r.global_rank, r.ntile_bucket, round(r.cume_dist, 9),
               round(r.percent_rank, 9)) for r in ref.collect()}
    assert g == e
    # the whole point: no unpartitioned window funneling all rows into one
    # task (the reference plan above has exactly that)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window [" not in plan or "SinglePartition" not in plan


# ----------------------------------------------------------------- repeat_union
def test_repeat_union_fixpoint(spark):
    seed = spark.createDataFrame([(1,)], "n long")
    out = repeat_union(
        seed, lambda f: f.filter(F.col("n") < 10).select((F.col("n") + 1).alias("n"))
    )
    assert sorted(r.n for r in out.collect()) == list(range(1, 11))


def test_repeat_union_iteration_limit(spark):
    # Calcite's repeatUnionAll stops at the limit and returns what it has
    # (linq4j EnumerableDefaults.java:3823) — no error.
    seed = spark.createDataFrame([(1,)], "n long")
    out = repeat_union(
        seed, lambda f: f.select((F.col("n") + 1).alias("n")), iteration_limit=3
    )
    assert sorted(r.n for r in out.collect()) == [1, 2, 3, 4]


def test_repeat_union_distinct_dedups_seed(spark):
    seed = spark.createDataFrame([(1,), (1,), (2,)], "n long")
    out = repeat_union(
        seed, lambda f: f.filter(F.col("n") < 3).select((F.col("n") + 1).alias("n"))
    )
    assert sorted(r.n for r in out.collect()) == [1, 2, 3]


def test_repeat_union_deep_recursion_crosses_compaction(spark):
    """r15: past ACC_COMPACT_LEAVES rounds the accumulated union is
    compacted into one checkpointed RDD (bounded plan, O(1) driver
    planning per round). A chain deep enough to compact twice must
    still produce the exact closure in BOTH modes."""
    from drill_calcite_spark.operators.repeat_union import ACC_COMPACT_LEAVES

    depth = 2 * ACC_COMPACT_LEAVES + 5
    seed = spark.createDataFrame([(1,)], "n long")
    step = lambda f: f.filter(F.col("n") < depth).select(
        (F.col("n") + 1).alias("n"))
    out = repeat_union(seed, step, iteration_limit=depth + 10)
    assert sorted(r.n for r in out.collect()) == list(range(1, depth + 1))
    out_all = repeat_union(seed, step, distinct=False,
                           iteration_limit=depth + 10)
    assert sorted(r.n for r in out_all.collect()) == list(range(1, depth + 1))


def test_repeat_union_union_all_mode(spark):
    seed = spark.createDataFrame([(1,)], "n long")
    out = repeat_union(
        seed,
        lambda f: f.filter(F.col("n") < 3).select((F.col("n") + 1).alias("n")),
        distinct=False,
        iteration_limit=10,
    )
    # ALL mode stops only via the filter emptying the frontier
    assert sorted(r.n for r in out.collect()) == [1, 2, 3]


# --------------------------------------------------------------------- as-of
def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 100.0), ("A", 5, 101.0), ("B", 3, 50.0)],
        "sym string, qts long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 2), ("A", 5), ("A", 0), ("B", 9)], "sym string, tts long"
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts").collect()
    got = {(r.sym, r.tts): (r.px_asof, r.qts_asof) for r in out}
    assert got[("A", 2)] == (100.0, 1)
    assert got[("A", 5)] == (101.0, 5)   # inclusive at equal ts
    assert got[("A", 0)] == (None, None)  # no prior quote
    assert got[("B", 9)] == (50.0, 3)


# ------------------------------------------------------------------- snapshot
def test_snapshot_validity(spark):
    scd = spark.createDataFrame(
        [(1, "v1", "2020-01-01", "2020-06-01"),
         (1, "v2", "2020-06-01", None),
         (2, "w1", "2021-01-01", None)],
        "id long, val string, valid_from string, valid_to string",
    ).select(
        "id", "val",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    out = snapshot(scd, "2020-07-01").select("id", "val").collect()
    assert sorted((r.id, r.val) for r in out) == [(1, "v2")]
    out2 = snapshot(scd, "2020-03-01").select("id", "val").collect()
    assert sorted((r.id, r.val) for r in out2) == [(1, "v1")]


# ------------------------------------------------------------------ phonetics
def test_soundex_sql_twin_matches_spark(spark, duck):
    """The DuckDB soundex emulation (_SOUNDEX_SQL) must be char-exact with
    Spark's F.soundex on classic stress words — H/W run-bridging (Ashcraft),
    vowel run-breaking (Tymczak, Honeyman), first-letter collapse (Pfister,
    Lloyd), non-letters (O'Brien), and degenerate inputs."""
    from drill_calcite_spark.queries.funcs import _SOUNDEX_SQL

    words = [
        "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
        "Honeyman", "Jackson", "VanDeusen", "Lloyd", "Wheel", "Czarkowska",
        "O'Brien", "d123x", "gizmo", "H", "W", "Aeiou", "a", "Zz", "RRRRR",
    ]
    spark_res = {
        r.w: r.sx
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("sx")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _sx_words(w VARCHAR)")
    duck.executemany("INSERT INTO _sx_words VALUES (?)", [(w,) for w in words])
    duck_res = dict(
        duck.execute(
            f"SELECT w, {_SOUNDEX_SQL.format(col='w')} FROM _sx_words"
        ).fetchall()
    )
    assert spark_res == duck_res


# ----------------------------------------------------------------- JSON utils
def test_json_depth_pretty_mysql_cases(spark):
    """functions/json.py vs MySQL's documented JSON_DEPTH cases and python
    json.dumps(indent=2) pretty text, on compact literals."""
    import json as pyjson

    from drill_calcite_spark.functions.json import (
        json_depth, json_pretty, json_remove_key, json_storage_size,
    )

    docs = ['{}', '[]', '1', '"ab"', 'true', '[1]', '{"a":1}',
            '{"a":{"b":1},"c":[[2]]}', '[[],[1]]', '{"a":[]}']
    mysql_depth = [1, 1, 1, 1, 1, 2, 2, 4, 3, 2]
    df = spark.createDataFrame([(d,) for d in docs], "j string").select(
        "j",
        json_depth(F.col("j")).alias("d"),
        json_pretty(F.col("j")).alias("p"),
        json_storage_size(F.col("j")).alias("s"),
    )
    got = {r.j: r for r in df.collect()}
    for doc, want in zip(docs, mysql_depth):
        assert got[doc].d == want, (doc, got[doc].d, want)
        assert got[doc].s == len(doc.encode())
        if '{}' not in doc and '[]' not in doc:  # empty containers: MySQL
            # keeps them inline; our scan splits them (documented precondition)
            assert got[doc].p == pyjson.dumps(pyjson.loads(doc), indent=2), doc
    # NULL in, NULL out
    nrow = spark.createDataFrame([(None,)], "j string").select(
        json_depth(F.col("j")).alias("d")).collect()[0]
    assert nrow.d is None

    rm = spark.createDataFrame(
        [('{"a":1,"t":"x","b":2}',), ('{"t":"x","b":2}',), ('{"a":1,"t":"x"}',),
         ('{"t":"x"}',), ('{"a":1}',)], "j string"
    ).select("j", json_remove_key(F.col("j"), "t").alias("r")).collect()
    assert {r.j: r.r for r in rm} == {
        '{"a":1,"t":"x","b":2}': '{"a":1,"b":2}',
        '{"t":"x","b":2}': '{"b":2}',
        '{"a":1,"t":"x"}': '{"a":1}',
        '{"t":"x"}': '{}',
        '{"a":1}': '{"a":1}',
    }


def test_json_scan_strict_guards(spark):
    """The compact-JSON preconditions are enforced at runtime: violating
    input raises per-row (fail-loudly contract, VERDICT r6 #1) instead of
    silently returning a wrong number; empty/blank depth input is NULL."""
    import pytest as _pytest

    from drill_calcite_spark.functions.json import (
        json_depth, json_pretty, json_storage_size,
    )

    def run(expr_fn, doc):
        return (
            spark.createDataFrame([(doc,)], "j string")
            .select(expr_fn(F.col("j")).alias("v")).collect()[0].v
        )

    # violation paths raise with a pointer to the documented precondition
    for fn, bad in [
        (json_depth, '{"a":"[oops]"}'),      # bracket inside a string value
        (json_depth, '{"a":"x\\"y"}'),       # escaped quote (backslash)
        (json_pretty, '{ "a": 1 }'),         # whitespace outside strings
        (json_storage_size, '{"a":"x,y"}'),  # comma inside a string value
    ]:
        with _pytest.raises(Exception, match="precondition"):
            run(fn, bad)

    # empty/blank depth input is NULL (matches a max-over-zero-rows oracle)
    assert run(json_depth, "") is None
    assert run(json_depth, "   ") is None
    # whitespace OUTSIDE strings is fine for depth (the props-column shape)
    assert run(json_depth, '{"k": 87}') == 2
    # strict=False opts out of the guard (engine-generated input)
    assert run(lambda c: json_depth(c, strict=False), '{"k":1}') == 2


# ------------------------------------------------------------------ geometry
def test_ring_guards_raise_at_translate_time(spark):
    import pytest as _pytest

    from drill_calcite_spark.functions.geo import (
        st_contains_poly, st_distance_poly, sql_contains_poly,
    )

    with _pytest.raises(ValueError, match=">= 3 vertices"):
        st_contains_poly([(0.0, 0.0), (1.0, 1.0)], F.lit(0.0), F.lit(0.0))
    # all-horizontal ring: zero area, ray cast would hit no edge
    with _pytest.raises(ValueError, match="non-horizontal"):
        st_contains_poly([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)],
                         F.lit(0.0), F.lit(0.0))
    with _pytest.raises(ValueError, match="non-horizontal"):
        sql_contains_poly([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)], "x", "y")
    # duplicate consecutive vertices collapse the ring below 3 real edges
    with _pytest.raises(ValueError, match="duplicate consecutive"):
        st_distance_poly([(0.0, 0.0), (0.0, 0.0), (1.0, 1.0), (1.0, 1.0)],
                         F.lit(0.0), F.lit(0.0))
    # a ring with ONE duplicate vertex but >= 3 distinct edges is fine:
    # the zero-length edge is skipped, not divided by
    st_distance_poly([(0.0, 0.0), (0.0, 0.0), (1.0, 0.0), (1.0, 1.0),
                      (0.0, 1.0)], F.lit(5.0), F.lit(5.0))


def test_poly_poly_ground_truth(spark):
    """Known geometric facts for the polygon-polygon relations: unit
    squares fully inside / outside / straddling a 10..90 C-ring, and a
    square swallowing the hole ring."""
    from drill_calcite_spark.functions.geo import (
        st_contains_poly_poly, st_intersects_poly_poly, st_within_poly_poly,
    )
    from drill_calcite_spark.queries.funcs import _POLY_C, _POLY_HOLE

    # cx, cy, h: square center + half-width
    cases = [
        (30.0, 80.0, 5.0, "inside_c"),       # inside the C's top arm
        (200.0, 200.0, 5.0, "outside"),      # far away
        (10.0, 50.0, 5.0, "straddles_c"),    # straddles the left wall
        (30.0, 27.5, 14.0, "swallows_hole"), # hole is (20..40, 20..35)
    ]
    df = spark.createDataFrame(
        [(n, cx, cy, h) for cx, cy, h, n in cases],
        "name string, cx double, cy double, h double",
    )
    lo_x, hi_x = F.col("cx") - F.col("h"), F.col("cx") + F.col("h")
    lo_y, hi_y = F.col("cy") - F.col("h"), F.col("cy") + F.col("h")
    sq = [(lo_x, lo_y), (hi_x, lo_y), (hi_x, hi_y), (lo_x, hi_y)]
    got = {
        r.name: r
        for r in df.select(
            "name",
            st_intersects_poly_poly(_POLY_C, sq).alias("meets"),
            st_contains_poly_poly(_POLY_C, sq).alias("in_c"),
            st_within_poly_poly(_POLY_HOLE, sq).alias("hole_in_sq"),
        ).collect()
    }
    assert (got["inside_c"].meets, got["inside_c"].in_c) == (True, True)
    assert (got["outside"].meets, got["outside"].in_c) == (False, False)
    assert (got["straddles_c"].meets, got["straddles_c"].in_c) == (True, False)
    assert got["swallows_hole"].hole_in_sq is True
    assert got["inside_c"].hole_in_sq is False


# ----------------------------------------------------------- join strategies
def test_join_strategy_hints_agree(spark):
    """The cross-validation formerly embedded in the join_strategy_hints
    registered query (round-5 verdict: no eager collects in queries()):
    the same logical join planned as SHUFFLE_HASH / MERGE / BROADCAST must
    show the hinted node in the physical plan and produce identical rows."""
    from tests.conftest import SF_DIR

    from drill_calcite_spark.queries.common import t as load

    supp = load(spark, SF_DIR, "supplier")
    nat = load(spark, SF_DIR, "nation")

    def agg(j):
        return j.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )

    cases = {
        "SHUFFLE_HASH": ("ShuffledHashJoin", "shuffle_hash"),
        "MERGE": ("SortMergeJoin", "merge"),
        "BROADCAST": ("BroadcastHashJoin", "broadcast"),
    }
    rows = {}
    for label, (node, hint) in cases.items():
        j = supp.join(nat.hint(hint), supp.s_nationkey == nat.n_nationkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, f"{label} hint ignored; plan:\n{plan[:800]}"
        rows[label] = sorted(map(tuple, agg(j).collect()))
    assert rows["SHUFFLE_HASH"] == rows["MERGE"] == rows["BROADCAST"]
    assert len(rows["MERGE"]) > 0


def test_brace_quantifier_max_less_than_min_rejected():
    # {m,n} with n < m passes the shape regex but would be a run-time
    # PatternSyntaxException — must fail at translate time (advice r5)
    with pytest.raises(ValueError, match="max < min"):
        similar_to_regex("a{3,2}")
    # boundary: n == m is valid
    import re as _re
    assert _re.match(similar_to_regex("a{2,2}"), "aa")


def test_distributed_distribution_assume_unique(spark):
    """assume_unique skips tie detection; results identical to the
    detected path on genuinely unique keys."""
    from drill_calcite_spark.operators.ranks import distributed_distribution

    df = spark.range(100).select(F.col("id").alias("v"))
    a = sorted(map(tuple, distributed_distribution(
        df, ["v"], ntile=4, num_partitions=4).collect()))
    b = sorted(map(tuple, distributed_distribution(
        df, ["v"], ntile=4, num_partitions=4, assume_unique=True).collect()))
    assert a == b and len(a) == 100


# -------------------------------------------------------------- profiler FDs
def test_discover_fds_constructed(spark):
    """discover_fds on data with known dependencies: id is unique, id→dep
    and dep→band hold (dep = id%5, band = dep%2), band→dep fails."""
    from drill_calcite_spark.operators.profile import discover_fds

    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 5).alias("dep"),
        ((F.col("id") % 5) % 2).alias("band"),
    )
    got = {(r.lhs, r.rhs): r.fd_holds
           for r in discover_fds(df, ["id", "dep", "band"]).collect()}
    assert got[("id", "*")] is True
    assert got[("id", "dep")] is True
    assert got[("dep", "band")] is True
    assert got[("band", "dep")] is False
    assert got[("dep", "*")] is False
    # approximate mode runs single-pass and returns the same shape
    approx = discover_fds(df, ["id", "dep"], approximate=True).collect()
    assert {(r.lhs, r.rhs) for r in approx} == {
        ("id", "dep"), ("dep", "id"), ("id", "*"), ("dep", "*")}


def test_geo_measures_unit_square(spark):
    from drill_calcite_spark.functions.geo import (
        st_area_colring, st_centroid_colring, st_line_length, st_make_line,
        st_num_points, st_perimeter_colring,
    )

    df = spark.createDataFrame([(1,)], "id long")
    z, o = F.lit(0.0), F.lit(1.0)
    sq = [(z, z), (o, z), (o, o), (z, o)]
    cx, cy = st_centroid_colring(sq)
    line = st_make_line(sq)
    r = df.select(
        st_area_colring(sq).alias("a"),
        cx.alias("cx"), cy.alias("cy"),
        st_perimeter_colring(sq).alias("p"),
        st_line_length(sq).alias("ll"),
        line.alias("wkt"),
        st_num_points(line).alias("np"),
    ).collect()[0]
    assert (r.a, r.cx, r.cy, r.p, r.ll, r.np) == (1.0, 0.5, 0.5, 4.0, 3.0, 4)
    assert r.wkt == ("LINESTRING (0.000000 0.000000, 1.000000 0.000000, "
                     "1.000000 1.000000, 0.000000 1.000000)")


# --------------------------------------------------------------- SINGLE_VALUE
def test_single_value_guard(spark):
    from drill_calcite_spark.functions.agg import single_value

    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    got = {r.k: r.sv for r in
           ok.groupBy("k").agg(single_value(F.col("v")).alias("sv")).collect()}
    assert got == {1: "a", 2: "b"}

    bad = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    with pytest.raises(Exception, match="SINGLE_VALUE"):
        bad.groupBy("k").agg(single_value(F.col("v")).alias("sv")).collect()


def test_geo_buffer_ground_truth(spark):
    """Unit-radius 8-gon buffer at the origin: area = ½·8·sin(π/4)
    = 2·√2, center inside, (1.5, 0) outside, disjoint union counts 2."""
    import math

    from drill_calcite_spark.functions.geo import (
        st_area_colring, st_buffer_point_ring, st_contains_colring,
        st_num_geometries, st_polygon_wkt, st_union_disjoint_wkt,
    )

    df = spark.createDataFrame([(1,)], "id long")
    z, o = F.lit(0.0), F.lit(1.0)
    ring = st_buffer_point_ring(z, z, o, 8)
    ring2 = st_buffer_point_ring(F.lit(40.0), z, o, 8)
    union = st_union_disjoint_wkt(st_polygon_wkt(ring), st_polygon_wkt(ring2))
    r = df.select(
        st_area_colring(ring).alias("a"),
        st_contains_colring(ring, z, z).alias("c0"),
        st_contains_colring(ring, F.lit(1.5), z).alias("c15"),
        st_num_geometries(st_polygon_wkt(ring)).alias("n1"),
        st_num_geometries(union).alias("n2"),
        union.alias("u"),
    ).collect()[0]
    assert abs(r.a - 2.0 * math.sqrt(2.0)) < 1e-9
    assert r.c0 is True and r.c15 is False
    assert (r.n1, r.n2) == (1, 2)
    assert r.u.startswith("MULTIPOLYGON (((") and r.u.endswith(")))")


def test_geo_buffer_segments_error_bound(spark):
    """The documented radial error bound r·(1 − cos(π/N)) (VERDICT r6
    #2): at N=16 a probe just inside the bound radius is contained, one
    just outside r is not, and the 16-gon area is within the bound's
    area deficit of πr² — the knob a user sizes ``segments`` with."""
    import math

    from drill_calcite_spark.functions.geo import (
        st_area_colring, st_buffer_point_ring, st_contains_colring,
    )

    df = spark.createDataFrame([(1,)], "id long")
    z = F.lit(0.0)
    n = 16
    ring = st_buffer_point_ring(z, z, F.lit(1.0), n)
    inradius = math.cos(math.pi / n)  # 1 - bound
    # probe at an edge-midpoint angle — the worst case for the N-gon
    mid = math.pi / n
    r_in = df.select(
        st_contains_colring(
            ring, F.lit((inradius - 1e-9) * math.cos(mid)),
            F.lit((inradius - 1e-9) * math.sin(mid))).alias("inside"),
        st_contains_colring(
            ring, F.lit((1.0 + 1e-9) * math.cos(mid)),
            F.lit((1.0 + 1e-9) * math.sin(mid))).alias("outside"),
        st_area_colring(ring).alias("area"),
    ).collect()[0]
    assert r_in.inside is True
    assert r_in.outside is False
    exact = 0.5 * n * math.sin(2.0 * math.pi / n)
    assert abs(r_in.area - exact) < 1e-9
    assert math.pi - r_in.area < math.pi * 2.0 * (1.0 - math.cos(math.pi / n))


def test_json_remove_key_metacharacters(spark):
    """Keys with regex metacharacters are quoted, not interpreted
    (review round-6): 'a.b' must not match 'axb'."""
    from drill_calcite_spark.functions.json import json_remove_key

    rows = spark.createDataFrame(
        [('{"axb":1,"a.b":2}',)], "j string"
    ).select(json_remove_key(F.col("j"), "a.b").alias("r")).collect()
    assert rows[0].r == '{"axb":1}'


def test_discover_fds_underscore_collision(spark):
    """Pair aliases are positional, so ('x','y_z') vs ('x_y','z') cannot
    collide (review round-6)."""
    from drill_calcite_spark.operators.profile import discover_fds

    df = spark.createDataFrame(
        [(1, 1, 1, 1), (2, 2, 2, 2)], "x long, x_y long, y_z long, z long"
    )
    out = discover_fds(df, ["x", "x_y", "y_z", "z"]).collect()
    assert len(out) == 4 * 4  # 12 ordered pairs + 4 key rows
    assert all(r.fd_holds for r in out)  # all columns identical → all FDs


def test_discover_fds_null_tuple_semantics(spark):
    """NULL-bearing pairs count under row-tuple semantics in BOTH exact
    and approximate modes (review round-6: multi-arg countDistinct
    dropped them in exact mode only)."""
    from drill_calcite_spark.operators.profile import discover_fds

    df = spark.createDataFrame([(1, None), (2, "x")], "a long, b string")
    for approx in (False, True):
        got = {(r.lhs, r.rhs): r for r in
               discover_fds(df, ["a", "b"], approximate=approx).collect()}
        r = got[("a", "b")]
        assert (r.ndv_lhs, r.ndv_pair, r.fd_holds) == (2, 2, True), approx


def test_geo_type_identity_tail_ground_truth(spark):
    """Hand-computed cases for the round-7 type/identity tail
    (GeoFunctions.java:95-170,225-295,341-393): validity gating,
    3D accessors, OGC type codes, parsed vs byte equality, envelope
    touching counts as intersecting (closed intervals)."""
    from drill_calcite_spark.functions.geo import (
        st_as_text, st_envelopes_intersect_rings, st_equals_point,
        st_geom_from_text, st_geometry_type_code, st_is_3d, st_make_point,
        st_ordering_equals, st_ring_from_wkt, st_z,
    )

    df = spark.createDataFrame([(1,)], "id long")
    lit = F.lit
    # touching envelopes: [0,1]² and [1,2]² share only the corner (1,1)
    sq = "POLYGON ((0 0, 1 0, 1 1, 0 1))"
    sq_touch = "POLYGON ((1 1, 2 1, 2 2, 1 2))"
    sq_far = "POLYGON ((5 5, 6 5, 6 6, 5 6))"
    r = df.select(
        st_as_text(lit("SRID=3857;POINT (1.000000 2.000000)")).alias("atx"),
        st_geom_from_text(lit(sq)).alias("ok_wkt"),
        st_geom_from_text(lit("POINT 1 2")).alias("bad_wkt"),
        st_geom_from_text(lit(sq), 4326).alias("tagged"),
        st_make_point(lit(1.0), lit(2.0), lit(3.0)).alias("p3"),
        st_is_3d(st_make_point(lit(1.0), lit(2.0), lit(3.0))).alias("i3"),
        st_is_3d(lit("POINT (1.000000 2.000000)")).alias("i2"),
        st_z(st_make_point(lit(1.0), lit(2.0), lit(3.0))).alias("z3"),
        st_z(lit(sq)).alias("z_poly"),
        st_geometry_type_code(lit(sq)).alias("c_poly"),
        st_geometry_type_code(lit("LINESTRING (0 0, 1 1)")).alias("c_line"),
        st_geometry_type_code(lit("GEOMETRYCOLLECTION (POINT (0 0))"))
        .alias("c_coll"),
        st_geometry_type_code(lit("SRID=1;POINT (0 0)")).alias("c_unk"),
        st_equals_point(lit("POINT (1.000000 2.000000)"),
                        st_make_point(lit(1.0), lit(2.0))).alias("eq"),
        st_equals_point(lit("POINT (1.000000 2.000000)"),
                        st_make_point(lit(1.0), lit(2.5))).alias("neq"),
        st_ordering_equals(lit(sq), lit(sq)).alias("oeq"),
        st_envelopes_intersect_rings(
            st_ring_from_wkt(lit(sq)),
            st_ring_from_wkt(lit(sq_touch))).alias("env_touch"),
        st_envelopes_intersect_rings(
            st_ring_from_wkt(lit(sq)),
            st_ring_from_wkt(lit(sq_far))).alias("env_far"),
    ).collect()[0]
    assert r.atx == "POINT (1.000000 2.000000)"
    assert r.ok_wkt == sq and r.bad_wkt is None
    assert r.tagged == f"SRID=4326;{sq}"
    assert r.p3 == "POINT Z (1.000000 2.000000 3.000000)"
    assert r.i3 is True and r.i2 is False
    assert r.z3 == 3.0 and r.z_poly is None
    assert (r.c_poly, r.c_line, r.c_coll, r.c_unk) == (3, 2, 7, 0)
    assert r.eq is True and r.neq is False and r.oeq is True
    assert r.env_touch is True   # closed-interval contact intersects
    assert r.env_far is False


def test_geo_convex_clip_ground_truth(spark):
    """Sutherland–Hodgman vs hand-computed intersections with the clip
    square (0,0)-(14,14): straddling square → 4×4 corner overlap,
    fully-inside → unchanged, fully-outside → empty, and a triangle
    crossing one edge → trapezoid of known area."""
    from drill_calcite_spark.functions.geo import (
        clip_convex_edges, st_area_ring_arr, st_clip_convex_step,
        st_ring_from_wkt, st_ring_wkt_arr,
    )

    clip = clip_convex_edges([(0.0, 0.0), (14.0, 0.0), (14.0, 14.0),
                              (0.0, 14.0)])
    cases = [
        # (wkt, expected_area)
        ("POLYGON ((10 10, 20 10, 20 20, 10 20))", 16.0),   # corner overlap
        ("POLYGON ((2 2, 6 2, 6 6, 2 6))", 16.0),           # fully inside
        ("POLYGON ((20 20, 30 20, 25 30))", 0.0),           # fully outside
        # triangle (10,0) (18,0) (10,8): clipped at x=14 → trapezoid
        # area = ½·8·8 − ½·4·4 = 24
        ("POLYGON ((10 0, 18 0, 10 8))", 24.0),
    ]
    df = spark.createDataFrame([(i, w) for i, (w, _) in enumerate(cases)],
                               "id long, wkt string")
    g = df.withColumn("r0", st_ring_from_wkt(F.col("wkt")))
    for k, (a, b) in enumerate(clip, start=1):
        g = g.withColumn(f"r{k}", st_clip_convex_step(F.col(f"r{k-1}"), a, b))
    last = F.col(f"r{len(clip)}")
    rows = g.select(
        "id",
        F.when(F.size(last) >= 3, st_area_ring_arr(last))
        .otherwise(F.lit(0.0)).alias("area"),
        st_ring_wkt_arr(last).alias("wkt_clip"),
    ).orderBy("id").collect()
    for (w, want), row in zip(cases, rows):
        assert abs(row.area - want) < 1e-9, (w, row.area, want)
    assert rows[2].wkt_clip is None          # empty intersection → NULL
    assert rows[1].wkt_clip is not None      # inside stays a polygon


def test_sha1_against_hashlib(spark):
    """SHA1 (SqlLibraryOperators digest family): DuckDB core ships no
    sha1, so the oracle can't check it — pin Spark's F.sha1 against
    Python hashlib goldens instead (md5/sha256 are oracle-checked in
    func_hashes / func_strings_codec)."""
    import hashlib

    vals = ["", "abc", "drill-calcite", "Customer#000000042"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in
           df.select("s", F.sha1("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == hashlib.sha1(v.encode()).hexdigest(), v


def test_geo_contains_properly_ground_truth(spark):
    """ST_Contains vs ST_ContainsProperly against the clip square
    (0,0)-(14,14) on hand-placed subjects: strictly-interior → both true;
    edge-touching → contained but NOT properly; straddling / outside →
    neither. Also pins the inclusion-exclusion union-area identity
    area(P ∪ C) = area(P) + 196 − area(P ∩ C) on the same rows."""
    from drill_calcite_spark.functions.geo import (
        clip_convex_edges, convex_ring_area, st_area_ring_arr,
        st_clip_convex_step, st_contains_convex, st_ring_from_wkt,
    )

    square = [(0.0, 0.0), (14.0, 0.0), (14.0, 14.0), (0.0, 14.0)]
    assert convex_ring_area(square) == 196.0
    cases = [
        # (wkt, contains, properly, expected union area)
        ("POLYGON ((2 2, 6 2, 6 6, 2 6))", True, True, 196.0),    # interior
        ("POLYGON ((0 2, 6 2, 6 6, 0 6))", True, False, 196.0),   # edge touch
        ("POLYGON ((10 10, 20 10, 20 20, 10 20))", False, False,
         196.0 + 100.0 - 16.0),                                   # straddle
        ("POLYGON ((20 20, 30 20, 30 30, 20 30))", False, False,
         196.0 + 100.0),                                          # disjoint
    ]
    df = spark.createDataFrame([(i, w) for i, (w, *_) in enumerate(cases)],
                               "id long, wkt string")
    g = df.withColumn("r0", st_ring_from_wkt(F.col("wkt")))
    for k, (a, b) in enumerate(clip_convex_edges(square), start=1):
        g = g.withColumn(f"r{k}", st_clip_convex_step(F.col(f"r{k-1}"), a, b))
    last = F.col("r4")
    inter = (F.when(F.size(last) >= 3, st_area_ring_arr(last))
             .otherwise(F.lit(0.0)))
    rows = g.select(
        "id",
        st_contains_convex(square, F.col("r0")).alias("c"),
        st_contains_convex(square, F.col("r0"), proper=True).alias("p"),
        (st_area_ring_arr(F.col("r0")) + F.lit(196.0) - inter).alias("u"),
    ).orderBy("id").collect()
    for (w, want_c, want_p, want_u), row in zip(cases, rows):
        assert row.c == want_c and row.p == want_p, (w, row.c, row.p)
        assert abs(row.u - want_u) < 1e-9, (w, row.u, want_u)


def test_contains_convex_rejects_concave_region(spark):
    """Translate-time guard: a concave literal region must be rejected
    (the closed-form half-plane fold is only exact for convex regions)."""
    import pytest as _pytest

    from drill_calcite_spark.functions.geo import st_contains_convex

    concave = [(0.0, 0.0), (10.0, 0.0), (5.0, 5.0), (10.0, 10.0),
               (0.0, 10.0)]
    with _pytest.raises(ValueError, match="convex"):
        st_contains_convex(concave, F.lit(None))


def test_outer_join_onesided_condition(spark):
    """outer.iq:139 is DISABLED in the reference ("we cannot handle
    non-equi-join"): a RIGHT JOIN whose ON clause carries a one-sided
    predicate (emp.gender = 'F'). This engine executes it; the expected
    rows below are the MySQL answer recorded inside the reference's own
    disabled block — exceeds-reference behavior, pinned here."""
    from drill_calcite_spark.sources.test_schemas import register_post

    register_post(spark)
    rows = sorted(
        (tuple(r) for r in spark.sql(
            "select * from emp right join dept "
            "on emp.deptno = dept.deptno and emp.gender = 'F'").collect()),
        key=repr)
    assert rows == sorted([
        ("Jane", 10, "F", 10, "Sales"),
        ("Susan", 30, "F", 30, "Engineering"),
        ("Alice", 30, "F", 30, "Engineering"),
        (None, None, None, 20, "Marketing"),
        (None, None, None, 40, "Empty"),
    ], key=repr)


def test_match_recognize_ticker_skip_to_last_up(spark):
    """The canonical TICKER V-shape MATCH_RECOGNIZE with AFTER MATCH SKIP
    TO LAST UP (match.iq:164-180 — a case the reference itself DISABLES;
    its enabled match.iq cases record the experimental Enumerable
    implementation's nonstandard output, see tests/iq/README.md).
    Expected matches are hand-derived from the 20-day TICKER fixture
    under SQL:2016 semantics; SKIP TO LAST UP makes match 2 START on
    match 1's final rise (2017-12-10) — the overlap that
    skip_past_last_row cannot produce."""
    import pandas as pd

    from drill_calcite_spark.operators.match_recognize import (
        match_recognize,
    )
    from drill_calcite_spark.sources.test_schemas import register_post

    register_post(spark)
    ticker = spark.table("ticker")
    out = match_recognize(
        ticker, ["symbol"], ["tstamp"],
        pattern="STRT DOWN+ UP+",
        define={
            "DOWN": lambda p: p["price"] < p["price"].shift(1),
            "UP": lambda p: p["price"] > p["price"].shift(1),
        },
        measures={
            "symbol": lambda p, m: p["symbol"].iloc[0],
            "start_tstamp": lambda p, m: p["tstamp"].iloc[m["STRT"][0]],
            "bottom_tstamp": lambda p, m: p["tstamp"].iloc[m["DOWN"][-1]],
            "end_tstamp": lambda p, m: p["tstamp"].iloc[m["UP"][-1]],
        },
        output_schema=("symbol string, start_tstamp date, "
                       "bottom_tstamp date, end_tstamp date"),
        after_match="skip_to_last UP",
    )
    rows = sorted((r.symbol, str(r.start_tstamp), str(r.bottom_tstamp),
                   str(r.end_tstamp)) for r in out.collect())
    assert rows == [
        ("ACME", "2017-12-05", "2017-12-06", "2017-12-10"),
        ("ACME", "2017-12-10", "2017-12-12", "2017-12-13"),
        ("ACME", "2017-12-14", "2017-12-16", "2017-12-18"),
    ]


def test_match_recognize_skip_mode_validation(spark):
    """Malformed AFTER MATCH text still fails at translate time."""
    import pytest as _pytest

    from drill_calcite_spark.operators.match_recognize import (
        match_recognize,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError, match="AFTER MATCH"):
        match_recognize(
            df, ["id"], ["id"], "A", {"A": lambda p: p["v"] > 0},
            {"id": lambda p, m: p["id"].iloc[0]}, "id long",
            after_match="skip_sideways")


# ----------------------------------------------------------------- range join
def test_bucketed_range_join_equals_theta_and_includes_boundaries(spark):
    """The bucketed rewrite must return the identical row multiset as
    the naive theta join — including rows at EXACTLY the window edges
    (delta 0 and delta == window), and across bucket boundaries."""
    from drill_calcite_spark.operators.range_join import (
        bucketed_range_join, range_join_theta)

    W = 60 * 1_000_000  # 1-minute window
    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 00:00:30"),   # straddles the :01 bucket edge
         (2, "k", "2024-01-01 00:01:00"),   # exactly ON a bucket edge
         (3, "x", "2024-01-01 00:00:00")],
        "lid long, key string, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    right = spark.createDataFrame(
        [(10, "k", "2024-01-01 00:00:30"),  # delta 0 vs lid=1
         (11, "k", "2024-01-01 00:01:30"),  # delta == W vs lid=1 (edge in)
         (12, "k", "2024-01-01 00:02:00"),  # delta == W vs lid=2
         (13, "k", "2024-01-01 00:02:01"),  # out of range for both
         (14, "y", "2024-01-01 00:00:10")], # key mismatch
        "rid long, key string, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))

    b = bucketed_range_join(left, right, "key", "lts", "rts", W)
    th = range_join_theta(left, right, "key", "lts", "rts", W)
    cols = ["lid", "rid", "delta_us"]
    got = sorted(tuple(r) for r in b.select(cols).collect())
    want = sorted(tuple(r) for r in th.select(cols).collect())
    assert got == want
    assert got == [(1, 10, 0), (1, 11, W), (2, 11, 30_000_000), (2, 12, W)]


def test_bucketed_range_join_property_random_events(spark):
    """Property check over a deterministic pseudo-random event set (seeded
    — not hypothesis-driven, because each case spins Spark jobs): for
    several window widths, the bucketed rewrite must equal the theta join
    row-for-row. Events are dense enough (2000 in ~3 windows) that every
    bucket-edge relationship occurs."""
    import random

    from drill_calcite_spark.operators.range_join import (
        bucketed_range_join, range_join_theta)

    rng = random.Random(8)
    base = 1_700_000_000_000_000  # epoch micros
    rows = [(i, f"k{rng.randrange(5)}", base + rng.randrange(0, 10_000_000))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, key string, e long") \
        .withColumn("ts", F.timestamp_micros(F.col("e"))).drop("e")
    left = df.select(F.col("id").alias("lid"), "key",
                     F.col("ts").alias("lts"))
    right = df.select(F.col("id").alias("rid"), "key",
                      F.col("ts").alias("rts"))
    for w_us in (1, 999_999, 3_333_333):
        b = bucketed_range_join(left, right, "key", "lts", "rts", w_us)
        th = range_join_theta(left, right, "key", "lts", "rts", w_us)
        cols = ["lid", "rid", "delta_us"]
        got = sorted(tuple(r) for r in b.select(cols).collect())
        want = sorted(tuple(r) for r in th.select(cols).collect())
        assert got == want, f"divergence at window {w_us}"
        assert got, f"vacuous check at window {w_us}"


def test_pack_token_chunks_invariants(spark):
    """Packing invariants on the real table: chunk arithmetic is
    consistent (spans ≥ 1; a document spans exactly the chunks its
    token interval touches; within a source, consecutive docs tile the
    token axis with no gaps), and the assignment is bit-stable across
    re-runs (content-free hash order, no rand())."""
    import __spark_entry__ as entrymod

    from tests.conftest import SF_DIR

    q = entrymod.queries()["pack_token_chunks"]
    rows = q(spark, SF_DIR).collect()
    assert rows and all(r.chunks_spanned >= 1 for r in rows)
    # per-source, token intervals tile [0, total) exactly: reconstruct
    # cumulative starts from n_tok and re-derive each doc's chunk span
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    import hashlib

    for src, rs in by_src.items():
        # replay the operator's own packing order: (md5(doc_id), doc_id)
        rs = sorted(rs, key=lambda r: (
            hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
        cum = 0
        for r in rs:
            assert r.chunk_start == cum // 512, (src, r)
            assert r.chunks_spanned == (cum + r.n_tok - 1) // 512 \
                - cum // 512 + 1, (src, r)
            cum += r.n_tok
    again = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert again == sorted(map(tuple, rows))


def test_bloom_no_false_negatives_and_prunes(spark):
    """operators/bloom.py: membership never misses a build-side key
    (join after prune == plain join), the prune genuinely drops
    definitely-absent rows, and the bit array stays capped at m."""
    from drill_calcite_spark.operators.bloom import (
        BLOOM_BITS, bloom_build, bloom_prune)

    small = spark.createDataFrame(
        [(i,) for i in range(0, 100, 7)], "k long")          # 15 keys
    big = spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], "k long, v string")
    bloom = bloom_build(small, "k")
    (brow,) = bloom.collect()
    assert brow.n_bits == len(brow.bits) <= BLOOM_BITS

    pruned = bloom_prune(big, bloom, "k")
    kept = {r.k for r in pruned.collect()}
    assert set(range(0, 100, 7)) <= kept          # no false negatives
    assert len(kept) < 500                        # pruning happened

    joined = sorted(map(tuple, pruned.join(small, "k").collect()))
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    assert joined == plain


def test_match_recognize_running_aggregate_define_packing(spark):
    """The SECOND query the reference disables in match.iq (:57-82) —
    Oracle's canonical name-packing sessionization: B extends while
    CHAR_LENGTH(S.ename) + SUM(CHAR_LENGTH(b.ename || ';')) +
    CHAR_LENGTH(';') <= 15, a RUNNING AGGREGATE in DEFINE that a
    static per-row predicate cannot express (exactly why Calcite's
    Enumerable NFA has the block disabled). StatefulDef evaluates the
    condition inside the backtracking matcher against the rows matched
    so far; the expected 12 rows are the disabled block's own Oracle
    expected table (deptno/empno/MNO/CLASSIFIER), transcribed."""
    from drill_calcite_spark.operators.match_recognize import (
        StatefulDef, match_recognize,
    )
    from drill_calcite_spark.sources.test_schemas import register_scott

    register_scott(spark)
    emp = spark.table("scott_emp")

    def b_cond(pdf, j, m):
        s_len = len(pdf["ename"].iloc[m["S"][0]])
        b_sum = sum(len(pdf["ename"].iloc[r]) + 1 for r in m["B"])
        return s_len + b_sum + 1 <= 15

    out = match_recognize(
        emp, ["deptno"], ["empno"],
        pattern="S B+",
        define={"B": StatefulDef(b_cond)},
        measures={},
        output_schema=("deptno int, empno int, match_no int, "
                       "classifier string, ename string"),
        after_match="skip_past_last_row",
        rows_per_match="all",
    )
    rows = sorted((r.deptno, r.empno, r.match_no, r.classifier, r.ename)
                  for r in out.collect())
    # match.iq:61-76 expected table (the disabled block's Oracle output)
    assert rows == [
        (10, 7782, 1, "S", "CLARK"), (10, 7839, 1, "B", "KING"),
        (20, 7369, 1, "S", "SMITH"), (20, 7566, 1, "B", "JONES"),
        (20, 7788, 2, "S", "SCOTT"), (20, 7876, 2, "B", "ADAMS"),
        (30, 7499, 1, "S", "ALLEN"), (30, 7521, 1, "B", "WARD"),
        (30, 7654, 2, "S", "MARTIN"), (30, 7698, 2, "B", "BLAKE"),
        (30, 7844, 3, "S", "TURNER"), (30, 7900, 3, "B", "JAMES"),
    ]
