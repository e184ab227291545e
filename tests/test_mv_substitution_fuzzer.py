"""Property fuzzer for the front-door MV substitution layer
(plans/sql_substitution.py): random (tile, query) pairs where the tile
provably serves the query — random dim supersets, stored-measure
subsets (including NULL-bearing avg/count re-aggregation), residual
atoms on tile dims — must (a) actually substitute (inputFiles = tile
only) and (b) return EXACTLY what spark.sql returns for the same text
over the base view. The closed-world parser and the rollup algebra are
both under test; a silent fall-through counts as a failure because the
whole point is that a serveable query never pays the base scan.

A second lane fuzzes JOIN-MV unification: the literal SQL join spelled
with either key order and either table order must all unify with the
one registered join tile by canonical signature (within-pair key sort
+ sorted tables) and never re-execute the join."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

_MEASURE_SPACE = [("sum", "v"), ("min", "v"), ("max", "v"),
                  ("avg", "v"), ("count", "v")]


@pytest.fixture(scope="module")
def _env(spark, tmp_path_factory):
    # NULLs in v exercise the per-column count re-aggregation; two dims
    # with skewed cardinality exercise rollup grain changes
    rows = [(f"g{i % 3}", f"s{i % 5}",
             None if i % 7 == 0 else float(i % 11) - 3.0)
            for i in range(60)]
    base = spark.createDataFrame(rows, "k1 string, k2 string, v double")
    base.createOrReplaceTempView("mvf")
    return spark, base, tmp_path_factory.mktemp("mvf_tiles")


_TILES: dict = {}


def _tile_for(env, dims: tuple, ops: tuple, where: tuple):
    """One registry per distinct tile config, cached — tile builds are
    the expensive step, and identical configs must behave identically."""
    from drill_calcite_spark.plans.materialized import MaterializedViews

    spark, base, root = env
    key = (dims, ops, where)
    if key not in _TILES:
        mvs = MaterializedViews(spark)
        mvs.create(f"t{len(_TILES)}", "mvf", base, list(dims),
                   [(op, col) for op, col in ops],
                   str(root / f"tile{len(_TILES)}"),
                   where=list(where) or None)
        _TILES[key] = mvs
    return _TILES[key]


@st.composite
def _cases(draw):
    tile_dims = tuple(draw(st.sampled_from(
        [("k1",), ("k2",), ("k1", "k2")])))
    q_dims = tuple(d for d in tile_dims
                   if draw(st.booleans())) or (tile_dims[0],)
    stored = tuple(sorted(draw(st.sets(
        st.sampled_from(_MEASURE_SPACE), min_size=1, max_size=4))))
    # query measures: any stored subset, count(*) always available
    q_meas = [(op, col) for op, col in stored if draw(st.booleans())]
    if not q_meas or draw(st.booleans()):
        q_meas.append(("count", "*"))
    # optional residual atom on a QUERY-VISIBLE tile dim
    atom = None
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(tile_dims)))
        val = draw(st.sampled_from(
            ["g0", "g1", "g2"] if col == "k1" else ["s0", "s1", "s4"]))
        atom = (col, draw(st.sampled_from(["=", "<", ">="])), val)
    # optional COUNT(DISTINCT tile_dim) item — served from tile grain
    # (r13 late: the AggregateStarTableRule count-distinct serve);
    # optional paren wrapping of the WHERE conjunction exercises the
    # flattener the DateRangeRules output shape requires
    cd_col = (draw(st.sampled_from(sorted(tile_dims)))
              if draw(st.booleans()) else None)
    wrap = draw(st.booleans())
    # optional dim-only OR group (r14: the bounded-disjunction residual
    # — the `<>`-year / disjoint-IN-list range shape); branches are
    # single atoms or two-atom conjunctions, each on a tile dim
    orgroup = None
    if draw(st.booleans()):
        branches = []
        for _ in range(draw(st.integers(2, 3))):
            col = draw(st.sampled_from(sorted(tile_dims)))
            vals = ["g0", "g1", "g2"] if col == "k1" else \
                ["s0", "s1", "s4"]
            b = [(col, draw(st.sampled_from(["=", "<", ">="])),
                  draw(st.sampled_from(vals)))]
            if draw(st.booleans()):
                b.append((col, "<=", draw(st.sampled_from(vals))))
            branches.append(b)
        orgroup = branches
    return tile_dims, stored, q_dims, q_meas, atom, cd_col, wrap, orgroup


@settings(max_examples=30, deadline=None)
@given(case=_cases())
def test_substitution_equivalence(_env, case):
    from drill_calcite_spark.plans.sql_substitution import try_substitute

    spark, _base, _root = _env
    tile_dims, stored, q_dims, q_meas, atom, cd_col, wrap, orgroup = case
    mvs = _tile_for(_env, tile_dims, stored, ())

    sel = list(q_dims) + [
        f"{op}({col}) as m{i}" for i, (op, col) in enumerate(q_meas)]
    if cd_col is not None:
        sel.append(f"count(distinct {cd_col}) as cd0")
    conds = []
    if atom is not None:
        col, op, val = atom
        cond = f"{col} {op} '{val}'"
        conds.append(f"({cond})" if wrap else cond)
    if orgroup is not None:
        branches = []
        for b in orgroup:
            bt = " and ".join(f"{c} {o} '{v}'" for c, o, v in b)
            branches.append(f"({bt})" if len(b) > 1 else bt)
        conds.append("(" + " or ".join(branches) + ")")
    where = f" where {' and '.join(conds)}" if conds else ""
    text = (f"select {', '.join(sel)} from mvf{where} "
            f"group by {', '.join(q_dims)}")

    out = try_substitute(spark, text, mvs)
    assert out is not None, f"serveable query fell through: {text}"
    files = out.inputFiles()
    # a contradictory drawn predicate (e.g. k1 < 'g0' AND k1 = 'g0')
    # lets Catalyst fold the tile scan into an empty LocalTableScan —
    # zero input files is NOT a base-scan fallback; the value equality
    # below still proves the (empty) answer
    assert all("tile" in f for f in files), \
        f"substitution paid the base scan: {text}"
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, spark.sql(text).collect()))
    assert got == want, (text, got, want)


# ---------------------------------------------------------------- join-MVs

@pytest.fixture(scope="module")
def _jenv(spark, tmp_path_factory):
    """A fact ⋈ dim pair registered as ONE join-MV; the fuzzer then
    spells the literal SQL join every way the canonical signature must
    normalize (key equality reversed, dim subsets, measures)."""
    from drill_calcite_spark.plans.materialized import MaterializedViews

    fact = spark.createDataFrame(
        [(f"g{i % 4}", float(i % 9) - 2.0) for i in range(48)],
        "fk string, v double")
    dim = spark.createDataFrame(
        [(f"g{i}", f"seg{i % 2}") for i in range(4)],
        "dk string, seg string")
    fact.createOrReplaceTempView("jfact")
    dim.createOrReplaceTempView("jdim")
    root = tmp_path_factory.mktemp("mvf_join_tiles")
    mvs = MaterializedViews(spark)
    mvs.create_join(
        "jtile", {"jfact": fact, "jdim": dim}, [("fk", "dk")],
        dims=["seg", "fk"], measures=[("sum", "v"), ("max", "v")],
        path=str(root / "jtile"))
    return spark, mvs


@st.composite
def _join_cases(draw):
    q_dims = draw(st.sampled_from(
        [("seg",), ("fk",), ("seg", "fk"), ("fk", "seg")]))
    q_meas = draw(st.sets(st.sampled_from(
        [("sum", "v"), ("max", "v"), ("count", "*")]),
        min_size=1, max_size=3))
    reversed_on = draw(st.booleans())
    swap_tables = draw(st.booleans())
    return q_dims, tuple(sorted(q_meas)), reversed_on, swap_tables


@settings(max_examples=20, deadline=None)
@given(case=_join_cases())
def test_join_substitution_equivalence(_jenv, case):
    """Every spelling of the registered equi-join (either key order,
    either table order) must unify with the join-MV by canonical
    signature and return exactly what spark.sql computes for the
    literal join text."""
    from drill_calcite_spark.plans.sql_substitution import try_substitute

    spark, mvs = _jenv
    q_dims, q_meas, reversed_on, swap_tables = case
    on = "dk = fk" if reversed_on else "fk = dk"
    frm = ("jdim join jfact on " if swap_tables
           else "jfact join jdim on ") + on
    sel = list(q_dims) + [
        f"{op}({col}) as m{i}" for i, (op, col) in enumerate(q_meas)]
    text = (f"select {', '.join(sel)} from {frm} "
            f"group by {', '.join(q_dims)}")

    out = try_substitute(spark, text, mvs)
    assert out is not None, f"serveable join query fell through: {text}"
    files = out.inputFiles()
    assert files and all("jtile" in f for f in files), \
        f"join substitution re-executed the join: {text}"
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, spark.sql(text).collect()))
    assert got == want, (text, got, want)
