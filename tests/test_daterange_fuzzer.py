"""Property fuzzer for the DateRangeRules port (sql.py
_rewrite_date_ranges): random date-part predicates are rendered to
Calcite SQL, run through the FULL front door (calcite_sql → rewritten
ranges → Spark), and compared against a pure-Python evaluation of the
ORIGINAL predicate over a boundary-heavy timestamp corpus. A text
rewrite is regex-fragile by nature — this lane is the machine check
that every rewritten shape (all comparison directions, both operand
orders, BETWEEN/IN, YEAR+MONTH and YEAR+QUARTER conjunctions, the
YEAR+MONTH+DAY triple in any conjunct order, FLOOR/CEIL to unit) stays
row-identical to the date-part semantics, including exactly at unit
boundaries (Dec 31 23:59:59.999999 vs Jan 1 00:00:00) where an
off-by-one in a half-open bound would flip rows."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

# boundary-heavy corpus: unit edges, one microsecond either side, and
# mid-range points across 1994-2001
_ROWS: list[dt.datetime] = []
for y in (1994, 1995, 1996, 1997, 2000):
    for base in (dt.datetime(y, 1, 1), dt.datetime(y, 3, 1),
                 dt.datetime(y, 7, 15, 12, 30, 45),
                 dt.datetime(y, 12, 31, 23, 59, 59, 999999)):
        _ROWS.append(base)
        _ROWS.append(base + dt.timedelta(microseconds=1))
        _ROWS.append(base - dt.timedelta(microseconds=1))
_ROWS = sorted(set(_ROWS))

_OPS = {"=": lambda a, b: a == b, "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b, ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b, "<>": lambda a, b: a != b,
        "!=": lambda a, b: a != b}

_UNIT_TRUNC = {
    "year": lambda d: d.replace(month=1, day=1, hour=0, minute=0,
                                second=0, microsecond=0),
    "quarter": lambda d: d.replace(month=d.month - (d.month - 1) % 3,
                                   day=1, hour=0, minute=0, second=0,
                                   microsecond=0),
    "month": lambda d: d.replace(day=1, hour=0, minute=0, second=0,
                                 microsecond=0),
    "day": lambda d: d.replace(hour=0, minute=0, second=0,
                               microsecond=0),
    "hour": lambda d: d.replace(minute=0, second=0, microsecond=0),
}

_UNIT_STEP = {
    "year": lambda d: d.replace(year=d.year + 1),
    "quarter": lambda d: (d.replace(year=d.year + 1, month=d.month - 9)
                          if d.month > 9 else d.replace(month=d.month + 3)),
    "month": lambda d: (d.replace(year=d.year + 1, month=1)
                        if d.month == 12 else d.replace(month=d.month + 1)),
    "day": lambda d: d + dt.timedelta(days=1),
    "hour": lambda d: d + dt.timedelta(hours=1),
}


def _ceil(unit: str, d: dt.datetime) -> dt.datetime:
    t = _UNIT_TRUNC[unit](d)
    return t if t == d else _UNIT_STEP[unit](t)


@pytest.fixture(scope="module")
def _view(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_ROWS)], "rid int, d timestamp")
    df.createOrReplaceTempView("dr_fuzz")
    return spark


_year = st.integers(min_value=1993, max_value=2002)
_cmp = st.sampled_from(sorted(_OPS))


def _part(draw, unit: str, val: int) -> str:
    """One equality conjunct — extract spelling or the unit-function
    shorthand (year(d)=k etc.), drawn independently per conjunct."""
    if draw(st.booleans()):
        return f"extract({unit} from d) = {val}"
    return f"{unit}(d) = {val}"


_UNIT_GET = {"year": lambda d: d.year, "month": lambda d: d.month,
             "day": lambda d: d.day,
             "quarter": lambda d: (d.month - 1) // 3 + 1}


def _conj(draw, parts):
    """Join conjuncts (each a (text, unit, val) triple or a
    (text, unit, val, op) quad) with AND in the drawn order, optionally
    prefixing an unparenthesized NOT to the whole text. SQL precedence
    binds that NOT to the FIRST comparison only — the r13 advisory's
    trap shape: a fold that eats the conjunction under the NOT negates
    BOTH conjuncts and flips rows. The returned eval applies the NOT
    to the first conjunct."""
    order = list(draw(st.permutations(parts)))
    neg = draw(st.booleans())
    text = " and ".join(p[0] for p in order)
    if neg:
        text = f"not {text}"

    def one(d, p):
        op = p[3] if len(p) > 3 else "="
        return _OPS[op](_UNIT_GET[p[1]](d), p[2])

    def ev(d, order=order, neg=neg):
        first = one(d, order[0])
        rest = all(one(d, p) for p in order[1:])
        return (not first if neg else first) and rest

    return text, ev


@st.composite
def _predicates(draw):
    """(calcite_sql_text, python_eval) pairs."""
    kind = draw(st.sampled_from(
        ["extract_cmp", "year_fn", "flip", "between", "inlist",
         "year_month", "year_quarter", "year_month_day", "floor",
         "ceil"]))
    if kind in ("extract_cmp", "year_fn", "flip"):
        op, y = draw(_cmp), draw(_year)
        fn = (f"extract(year from d)" if kind != "year_fn"
              else "year(d)")
        if kind == "flip":
            text = f"{y} {op} {fn}"
            return text, lambda d: _OPS[op](y, d.year)
        text = f"{fn} {op} {y}"
        return text, lambda d: _OPS[op](d.year, y)
    if kind == "between":
        a, b = draw(_year), draw(_year)
        return (f"extract(year from d) between {a} and {b}",
                lambda d: a <= d.year <= b)
    if kind == "inlist":
        ys = draw(st.lists(_year, min_size=1, max_size=4))
        return (f"year(d) in ({', '.join(map(str, ys))})",
                lambda d: d.year in ys)
    if kind == "year_month":
        # r14: any comparison direction on the month conjunct,
        # including out-of-domain months (0, 13) whose degenerate
        # ranges must stay row-identical
        y, m = draw(_year), draw(st.integers(0, 13))
        mop = draw(_cmp)
        mtext = (f"extract(month from d) {mop} {m}"
                 if draw(st.booleans()) else f"month(d) {mop} {m}")
        return _conj(draw, [(_part(draw, "year", y), "year", y),
                            (mtext, "month", m,
                             "<>" if mop == "!=" else mop)])
    if kind == "year_month_day":
        # any permutation of the three conjuncts, each independently in
        # extract or shorthand spelling; day up to 31 so impossible
        # dates (Feb 30) exercise the verbatim fallback
        y, m, dd = draw(_year), draw(st.integers(1, 12)), \
            draw(st.integers(1, 31))
        return _conj(draw, [(_part(draw, "year", y), "year", y),
                            (_part(draw, "month", m), "month", m),
                            (_part(draw, "day", dd), "day", dd)])
    if kind == "year_quarter":
        y, qq = draw(_year), draw(st.integers(0, 5))
        qop = draw(_cmp)
        qtext = (f"extract(quarter from d) {qop} {qq}"
                 if draw(st.booleans()) else f"quarter(d) {qop} {qq}")
        return _conj(draw, [(_part(draw, "year", y), "year", y),
                            (qtext, "quarter", qq,
                             "<>" if qop == "!=" else qop)])
    # floor / ceil vs a literal that is ALIGNED half the time
    unit = draw(st.sampled_from(sorted(_UNIT_TRUNC)))
    op = draw(_cmp)
    y = draw(_year)
    lit = dt.datetime(y, draw(st.integers(1, 12)), 1)
    if draw(st.booleans()):       # unaligned variant
        lit += dt.timedelta(days=draw(st.integers(0, 27)),
                            hours=draw(st.integers(0, 23)),
                            minutes=draw(st.integers(0, 59)))
    lit_s = lit.strftime("%Y-%m-%d %H:%M:%S")
    part = _UNIT_TRUNC[unit] if kind == "floor" else \
        (lambda d: _ceil(unit, d))
    return (f"{kind}(d to {unit}) {op} timestamp '{lit_s}'",
            lambda d: _OPS[op](part(d), lit))


@settings(max_examples=40, deadline=None)
@given(pred=_predicates())
def test_date_range_rewrite_equivalence(_view, pred):
    from drill_calcite_spark.sql import calcite_sql

    text, pyeval = pred
    got = sorted(r.rid for r in calcite_sql(
        _view, f"select rid from dr_fuzz where {text}").collect())
    want = sorted(i for i, t in enumerate(_ROWS) if pyeval(t))
    assert got == want, (text, got, want)


def test_not_bound_first_conjunct_is_not_folded(_view):
    """The exact r13-advisory counterexample, pinned deterministically:
    ``NOT year=1995 AND quarter=2`` means (NOT year=1995) AND quarter=2
    by SQL precedence. A fold that consumed both conjuncts would yield
    NOT(1995-Q2 range) — flipping e.g. 1995-01-15 from excluded to
    included. Both spellings (extract and shorthand), plus the
    parenthesized NOT where folding IS correct."""
    from drill_calcite_spark.sql import calcite_sql

    for txt in ("not extract(year from d) = 1995 "
                "and extract(quarter from d) = 2",
                "not year(d) = 1995 and quarter(d) = 2"):
        got = sorted(r.rid for r in calcite_sql(
            _view, f"select rid from dr_fuzz where {txt}").collect())
        want = sorted(i for i, t in enumerate(_ROWS)
                      if t.year != 1995 and (t.month - 1) // 3 + 1 == 2)
        assert got == want, txt
        assert any(_ROWS[i].year == 1995 for i in want) is False

    got = sorted(r.rid for r in calcite_sql(
        _view, "select rid from dr_fuzz where "
               "not (year(d) = 1995 and quarter(d) = 2)").collect())
    want = sorted(i for i, t in enumerate(_ROWS)
                  if not (t.year == 1995 and (t.month - 1) // 3 + 1 == 2))
    assert got == want
