"""MATCH_RECOGNIZE front-door fuzzer (round 10, VERDICT r9 item 6).

Generates random PATTERN x DEFINE x MEASURES x SKIP x ROWS-mode
combinations over seeded TICKER-like data, runs each case through the
SQL front door (sql_match.py translation), and asserts the result is
row-identical to a DIRECT operator call built from hand-written pandas
predicates/measures for the same abstract spec — the translator and the
twin share no code, so a translation bug surfaces as a row mismatch
while an envelope gap surfaces as MatchRecognizeUnsupported (loud-fail,
which this lane treats as a failure: every generated case must RUN).

The generator stays inside the documented envelope: measured symbols
are mandatory (>= 1 row — SQL aggregates over empty symbol sets are a
documented non-goal), values are dyadic halves so float sums are exact
in any order, and NOT is exercised both over constants and over PREV
comparisons (the twin spells the 3VL operator FLIP — NOT (a <= b) ≡
a > b with UNKNOWN preserved — which is what the translator must emit;
a pandas ~ would diverge on each partition's first row).

Seeds 0-13 include the five shapes that loud-failed before the r10
`(NOT ...)` paren-recursion fix in _bool_to_pandas/_negate.
"""

from __future__ import annotations

import random

import pytest

from drill_calcite_spark.operators.match_recognize import match_recognize
from drill_calcite_spark.sql import calcite_sql

CMP = {"<": lambda a, b: a < b, ">": lambda a, b: a > b,
       "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b}
FLIP = {"<": ">=", ">": "<=", "<=": ">", ">=": "<"}


def _gen_data(rng):
    return [("s%d" % p, i, rng.randrange(0, 20) / 2.0)
            for p in range(3) for i in range(30)]


def _gen_atom(rng, sym):
    kind = rng.choice(["prev", "prev2", "const", "notconst", "notprev"])
    cmp = rng.choice(list(CMP))
    f = CMP[cmp]
    if kind == "prev":
        return (f"{sym}.value {cmp} PREV({sym}.value)",
                lambda p: f(p["value"], p["value"].shift(1)))
    if kind == "prev2":
        return (f"{sym}.value {cmp} PREV({sym}.value, 2)",
                lambda p: f(p["value"], p["value"].shift(2)))
    if kind == "notprev":
        # twin = the 3VL FLIP, not ~: NaN comparisons stay unmatched
        g = CMP[FLIP[cmp]]
        return (f"NOT ({sym}.value {cmp} PREV({sym}.value))",
                lambda p: g(p["value"], p["value"].shift(1)))
    c = rng.choice([2.5, 4.0, 5.5, 7.0])
    if kind == "const":
        return (f"{sym}.value {cmp} {c}",
                lambda p: f(p["value"], c))
    return (f"NOT ({sym}.value {cmp} {c})",
            lambda p: ~f(p["value"], c))  # non-null operand: ~ == flip


def _gen_cond(rng, sym):
    atoms = [_gen_atom(rng, sym) for _ in range(rng.choice([1, 2]))]
    if len(atoms) == 1:
        return atoms[0]
    op = rng.choice(["AND", "OR"])
    sql = f"({atoms[0][0]}) {op} ({atoms[1][0]})"
    a0, a1 = atoms[0][1], atoms[1][1]
    fn = ((lambda p: a0(p) & a1(p)) if op == "AND"
          else (lambda p: a0(p) | a1(p)))
    return sql, fn


MEASURES = [
    ("f_a_ts", "FIRST(A.ts)",
     lambda p, m: int(p["ts"].iloc[m["A"][0]]), "bigint"),
    ("l_b_v", "LAST(B.value)",
     lambda p, m: float(p["value"].iloc[m["B"][-1]]), "double"),
    ("c_a", "COUNT(A.ts)", lambda p, m: len(m["A"]), "bigint"),
    ("s_b", "SUM(B.value)",
     lambda p, m: float(p["value"].iloc[m["B"]].sum()), "double"),
    ("mn_b", "MIN(B.value)",
     lambda p, m: float(p["value"].iloc[m["B"]].min()), "double"),
    ("mx_a", "MAX(A.value)",
     lambda p, m: float(p["value"].iloc[m["A"]].max()), "double"),
    ("av_b", "AVG(B.value)",
     lambda p, m: float(p["value"].iloc[m["B"]].mean()), "double"),
]
PATTERNS = ["A B+", "A+ B+", "A{1,2} B+", "A+ B", "A B"]
SKIPS = [("SKIP PAST LAST ROW", "skip_past_last_row"),
         ("SKIP TO NEXT ROW", "skip_to_next_row")]


@pytest.mark.parametrize("seed", range(14))
def test_front_door_equals_direct_operator(spark, seed):
    rng = random.Random(seed)
    df = spark.createDataFrame(_gen_data(rng),
                               "sym string, ts bigint, value double")
    df.createOrReplaceTempView("fuzzticker")
    pattern = rng.choice(PATTERNS)
    skip_sql, skip_op = rng.choice(SKIPS)
    a_sql, a_fn = _gen_cond(rng, "A")
    b_sql, b_fn = _gen_cond(rng, "B")
    if rng.random() < 0.4:  # ALL ROWS mode — half the cases also carry
        # a RUNNING SUM measure; its twin is a RunningMeasure whose
        # hand-written body sums the PREFIX the matcher hands it (B rows
        # can be empty before B's first row -> SQL NULL, not pandas 0)
        from drill_calcite_spark.operators.match_recognize import (
            RunningMeasure,
        )
        with_running = rng.random() < 0.5
        run_meas = {}
        run_sql = run_col = ""
        if with_running:
            run_sql = ", RUNNING SUM(B.value) AS rs"
            run_col = ", rs"
            run_meas = {"rs": RunningMeasure(
                lambda p, m: (float(p["value"].iloc[m["B"]].sum())
                              if m["B"] else None))}
        sql = f"""SELECT sym, ts, value, classifier, match_no{run_col}
        FROM fuzzticker MATCH_RECOGNIZE (
          PARTITION BY sym ORDER BY ts
          MEASURES MATCH_NUMBER() AS match_no, CLASSIFIER() AS classifier{run_sql}
          ALL ROWS PER MATCH
          AFTER MATCH {skip_sql}
          PATTERN ({pattern})
          DEFINE A AS {a_sql}, B AS {b_sql})"""
        direct = match_recognize(
            df, ["sym"], ["ts"], pattern,
            define={"A": a_fn, "B": b_fn}, measures=run_meas,
            output_schema="sym string, ts bigint, value double, "
                          "classifier string, match_no long"
                          + (", rs double" if with_running else ""),
            after_match=skip_op, rows_per_match="all")
        cols = (["sym", "ts", "value", "classifier", "match_no"]
                + (["rs"] if with_running else []))
    else:  # ONE ROW mode with three random measures (sometimes a SUBSET)
        ms = rng.sample(MEASURES, 3)
        subset_sql = subset_op = None
        if rng.random() < 0.5:
            # SUBSET U = (A, B): union-symbol measures aggregate over
            # every matched row of either member
            subset_sql = "SUBSET U = (A, B)"
            subset_op = {"U": ["A", "B"]}
            ms = ms[:2] + [("s_u", "SUM(U.value)",
                            lambda p, m: float(p["value"].iloc[m["U"]]
                                               .sum()), "double")]
        sql = f"""SELECT sym, {', '.join(n for n, _, _, _ in ms)}
        FROM fuzzticker MATCH_RECOGNIZE (
          PARTITION BY sym ORDER BY ts
          MEASURES {', '.join(f'{e} AS {n}' for n, e, _, _ in ms)}
          ONE ROW PER MATCH
          AFTER MATCH {skip_sql}
          PATTERN ({pattern})
          {subset_sql or ''}
          DEFINE A AS {a_sql}, B AS {b_sql})"""
        meas = {"sym": lambda p, m: p["sym"].iloc[0]}
        schema = ["sym string"]
        for n, _, fn, tp in ms:
            meas[n] = fn
            schema.append(f"{n} {tp}")
        direct = match_recognize(
            df, ["sym"], ["ts"], pattern,
            define={"A": a_fn, "B": b_fn}, measures=meas,
            output_schema=", ".join(schema),
            after_match=skip_op, rows_per_match="one",
            subset=subset_op)
        cols = ["sym"] + [n for n, _, _, _ in ms]
    via = calcite_sql(spark, sql)
    a = sorted(map(tuple, via.select(cols).collect()))
    b = sorted(map(tuple, direct.select(cols).collect()))
    assert a == b, f"front door != operator for:\n{sql}"
