"""Stateful-DEFINE compiler fuzzer (running aggregates in DEFINE).

The r10 no-eval recursive-descent compiler (_compile_stateful_define)
translates aggregate-bearing DEFINE text into StatefulDef closures.
This lane generates random conditions of its grammar — SUM/COUNT/MIN/
MAX/AVG over B-row expressions, combined with last-of-A references,
candidate-row columns, literals, arithmetic, comparisons, AND/OR/NOT —
and asserts the FRONT DOOR result is row-identical to a direct
operator call whose StatefulDef is a HAND-WRITTEN python twin of the
same abstract condition. Compiler and twin share no code, and both run
through the same matcher, so a mismatch isolates a translation bug
(the matcher itself is covered by test_operators/test_sql_match).

Every generated case must RUN: MatchRecognizeUnsupported is a failure,
pinning the envelope (the grammar the compiler documents) as tested.
"""

from __future__ import annotations

import random

import pytest

from drill_calcite_spark.operators.match_recognize import (
    StatefulDef, match_recognize,
)
from drill_calcite_spark.sql import calcite_sql

_CMP = {
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
}

# expressions over a single B row (used inside aggregates)
_INNERS = [
    ("B.v", lambda pdf, r: int(pdf["v"].iloc[r])),
    ("B.w", lambda pdf, r: int(pdf["w"].iloc[r])),
    ("B.v + B.w", lambda pdf, r: int(pdf["v"].iloc[r])
     + int(pdf["w"].iloc[r])),
    ("B.v * 2", lambda pdf, r: int(pdf["v"].iloc[r]) * 2),
    ("B.w + 1", lambda pdf, r: int(pdf["w"].iloc[r]) + 1),
]

# terms evaluated OUTSIDE aggregates: last-of-A refs and candidate row
_OUTERS = [
    ("A.v", lambda pdf, j, m: int(pdf["v"].iloc[m["A"][-1]])),
    ("A.w", lambda pdf, j, m: int(pdf["w"].iloc[m["A"][-1]])),
    ("v", lambda pdf, j, m: int(pdf["v"].iloc[j])),
    ("w", lambda pdf, j, m: int(pdf["w"].iloc[j])),
]


def _gen_agg(rng):
    inner_sql, inner_fn = rng.choice(_INNERS)
    agg = rng.choice(["SUM", "COUNT", "MIN", "MAX", "AVG"])

    def fn(pdf, j, m, _i=inner_fn, _a=agg):
        vals = [_i(pdf, r) for r in m.get("B", ())]
        if _a == "COUNT":
            return len(vals)
        if not vals:
            return None
        if _a == "SUM":
            return sum(vals)
        if _a == "MIN":
            return min(vals)
        if _a == "MAX":
            return max(vals)
        return sum(vals) / len(vals)

    return f"{agg}({inner_sql})", fn


def _gen_cmp(rng):
    """One comparison atom; the aggregate side makes it stateful."""
    agg_sql, agg_fn = _gen_agg(rng)
    cmp_s = rng.choice(list(_CMP))
    cmp_f = _CMP[cmp_s]
    lit = rng.randrange(2, 28)
    if rng.random() < 0.5:
        out_sql, out_fn = rng.choice(_OUTERS)
        sql = f"{agg_sql} + {out_sql} {cmp_s} {lit}"

        def fn(pdf, j, m, _a=agg_fn, _o=out_fn, _c=cmp_f, _l=lit):
            a = _a(pdf, j, m)
            if a is None:
                return None
            return _c(a + _o(pdf, j, m), _l)
    else:
        sql = f"{agg_sql} {cmp_s} {lit}"

        def fn(pdf, j, m, _a=agg_fn, _c=cmp_f, _l=lit):
            a = _a(pdf, j, m)
            if a is None:
                return None
            return _c(a, _l)
    return sql, fn


def _gen_cond(rng):
    """Boolean combination (Kleene 3VL, mirrored by the twin)."""
    s1, f1 = _gen_cmp(rng)
    shape = rng.choice(["atom", "and", "or", "not"])
    if shape == "atom":
        return s1, f1
    if shape == "not":
        def fn(pdf, j, m, _f=f1):
            v = _f(pdf, j, m)
            return None if v is None else (not v)
        return f"NOT ({s1})", fn
    s2, f2 = _gen_cmp(rng)
    if shape == "and":
        def fn(pdf, j, m, _f1=f1, _f2=f2):
            a, b = _f1(pdf, j, m), _f2(pdf, j, m)
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        return f"({s1}) AND ({s2})", fn

    def fn(pdf, j, m, _f1=f1, _f2=f2):
        a, b = _f1(pdf, j, m), _f2(pdf, j, m)
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    return f"({s1}) OR ({s2})", fn


_PATTERNS = ["A B+", "A B*", "A B{1,3}"]
_SKIPS = [("SKIP PAST LAST ROW", "skip_past_last_row"),
          ("SKIP TO NEXT ROW", "skip_to_next_row")]


@pytest.mark.parametrize("seed", range(14))
def test_stateful_define_front_door_equals_handwritten_twin(spark, seed):
    rng = random.Random(1000 + seed)
    data = [("s%d" % p, i, rng.randrange(1, 7), rng.randrange(1, 7))
            for p in range(3) for i in range(24)]
    df = spark.createDataFrame(data,
                               "sym string, ts bigint, v bigint, w bigint")
    df.createOrReplaceTempView("fuzzpack")
    pattern = rng.choice(_PATTERNS)
    skip_sql, skip_op = rng.choice(_SKIPS)
    cond_sql, cond_fn = _gen_cond(rng)
    sql = f"""SELECT sym, ts, v, w, classifier, match_no
    FROM fuzzpack MATCH_RECOGNIZE (
      PARTITION BY sym ORDER BY ts
      MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS classifier
      ALL ROWS PER MATCH
      AFTER MATCH {skip_sql}
      PATTERN ({pattern})
      DEFINE B AS {cond_sql})"""

    def twin(pdf, j, m, _f=cond_fn):
        return _f(pdf, j, m) is True

    direct = match_recognize(
        df, ["sym"], ["ts"], pattern,
        define={"B": StatefulDef(twin)}, measures={},
        output_schema="sym string, ts bigint, v bigint, w bigint, "
                      "classifier string, match_no long",
        after_match=skip_op, rows_per_match="all")
    cols = ["sym", "ts", "v", "w", "classifier", "match_no"]
    a = sorted(map(tuple, calcite_sql(spark, sql).select(cols).collect()))
    b = sorted(map(tuple, direct.select(cols).collect()))
    assert a == b, f"front door != twin for:\n{sql}"
