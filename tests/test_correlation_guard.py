"""Correlation-guard property lane (round 11, VERDICT r10 item 6).

`_subquery_has_outer_refs` (sql.py) gates the projected-IN and
quantified-comparison rewrites: a FALSE NEGATIVE (a correlated subquery
classified as uncorrelated) silently expands the subquery into
standalone scalar aggregates and changes its semantics. This lane pins
the guard two ways:

1. a labeled hand corpus — correlated/uncorrelated × IN/SOME/ALL/EXISTS
   bodies × alias shapes (AS / bare / schema-qualified / derived-table /
   string-masked / keyword-adjacent), every case asserting the guard's
   decision;
2. a seeded generator that composes subqueries from table items,
   derived tables, and qualified references that are either resolvable
   (qualifier introduced by a FROM/JOIN item) or OUTER by construction,
   so the expected label is known without a SQL engine. The generator
   emits only QUALIFIED outer references — bare-column correlation is
   documented out of guard scope (no catalog), exactly as in Calcite's
   RexSubQuery decorrelation preconditions.

The guard is allowed to be conservative (a false POSITIVE only skips an
optimization), so the hand corpus contains the known conservative cases
too, pinned with their current decision and a comment — if a refactor
flips one, the test fails and the change must be deliberate.
"""

from __future__ import annotations

import random

from drill_calcite_spark.sql import _subquery_has_outer_refs as guard

# --------------------------------------------------------------- corpus
# (subquery text, expected guard decision, why)
CORPUS = [
    # -- uncorrelated: every qualifier is introduced inside the subquery
    ("select x from t", False, "bare columns only"),
    ("select t.x from t", False, "table-name qualifier"),
    ("select a.x from t a", False, "bare alias"),
    ("select a.x from t as a", False, "AS alias"),
    ("select a.x from s.t a", False, "schema-qualified table + alias"),
    ("select t.x from s.t", False, "schema path component used"),
    ("select s.x from s.t", False, "schema component is defined too"),
    ("select d.x from (select x from t) d", False, "derived-table alias"),
    ("select d.x from (select x from t) as d", False, "derived AS alias"),
    ("select a.x, b.y from t a join u b on a.k = b.k", False,
     "join aliases"),
    ("select a.x from t a where a.y > 0 and a.z in (1,2)", False,
     "alias used in WHERE"),
    ("select x from t where c = 'o.ref'", False,
     "outer-looking ref inside a string literal is masked"),
    ("select count(*) from t group by t.k having t.k > 0", False,
     "qualifier in HAVING resolves"),
    # -- correlated: a qualifier that no FROM/JOIN item introduces
    ("select x from t where t.k = o.k", True, "classic EXISTS body"),
    ("select 1 from t where o.k = t.k", True, "outer ref first"),
    ("select a.x from t a where a.k = outer_t.k", True,
     "named outer table"),
    ("select x from t where t.k = o.k and t.j > 1", True,
     "outer ref among local predicates"),
    ("select max(u.v) from u where u.k = emp.dept", True,
     "scalar-agg correlation"),
    ("select d.x from (select x, k from t) d where d.k = o.k", True,
     "derived table + outer ref"),
    ("select a.x from t a join u b on a.k = o.k", True,
     "outer ref in ON clause"),
    ("select x from t where exists (select 1 from u where u.k = t.k) "
     "and o.flag = 1", True, "outer ref beside nested exists"),
    # -- conservative by design (documented): these are pinned so a
    # refactor that silently flips them fails the lane
    ("select x from t where k = any (select k from u)", False,
     "nested uncorrelated quantifier stays uncorrelated"),
    ("select x from t, u where t.k = u.k", False,
     "comma join: second table matched only via FROM regex — "
     "currently resolved because 'from t' defines t and u appears "
     "qualified; u is NOT captured by _FROM_ITEM, so this would be "
     "True-conservative... pinned to the actual decision below"),
]


def test_hand_corpus():
    for sub, want, why in CORPUS[:-1]:
        got = guard(sub)
        assert got is want, f"{why}: guard({sub!r}) = {got}, want {want}"


def test_comma_join_decision_is_pinned():
    """Comma-separated FROM lists: `u` is not captured by _FROM_ITEM
    (only from/join heads are), so `u.k` looks outer and the guard is
    CONSERVATIVE (True). That only skips the optimization — pinned here
    so a regex change that starts resolving comma items is deliberate."""
    assert guard("select x from t, u where t.k = u.k") is True


# ------------------------------------------------------------- generator
TABLES = ["t", "u", "s.v", "cat.sch.w"]
OUTER = ["emp", "o", "outer_t"]


def _item(rng, idx):
    """One FROM/JOIN item: (sql text, set of resolvable qualifiers)."""
    tbl = rng.choice(TABLES)
    names = set(tbl.split("."))
    kind = rng.randrange(3)
    if kind == 0:                       # bare table
        return tbl, names
    alias = f"a{idx}"
    as_kw = "as " if rng.random() < 0.5 else ""
    if kind == 1:                       # aliased table
        return f"{tbl} {as_kw}{alias}", names | {alias}
    inner = rng.choice(TABLES)          # derived table
    return (f"(select x, k from {inner}) {as_kw}{alias}",
            {alias})


def _pred(rng, local_quals, correlated):
    q = (rng.choice(sorted(local_quals)) if not correlated
         else rng.choice(OUTER))
    col = rng.choice(["k", "x", "flag"])
    op = rng.choice(["=", ">", "<=", "<>"])
    lhs = f"{q}.{col}"
    rhs = rng.choice(["1", "'lit'", f"{rng.choice(sorted(local_quals))}.j"])
    return f"{lhs} {op} {rhs}"


def _gen_case(rng):
    """Compose a subquery; returns (text, is_correlated)."""
    items = []
    quals = set()
    first, q0 = _item(rng, 0)
    items.append(f"from {first}")
    quals |= q0
    for j in range(rng.randrange(0, 3)):
        it, qs = _item(rng, j + 1)
        items.append(f"join {it} on 1 = 1")
        quals |= qs
    correlated = rng.random() < 0.5
    preds = [_pred(rng, quals, False) for _ in range(rng.randrange(0, 3))]
    if correlated:
        preds.insert(rng.randrange(len(preds) + 1),
                     _pred(rng, quals, True))
    rng.shuffle(preds)
    where = (" where " + " and ".join(preds)) if preds else ""
    sel = rng.choice(["x", f"{rng.choice(sorted(quals))}.x", "count(*)"])
    # decoys that must NOT flip the decision: outer-looking text inside
    # a string literal, and resolvable refs everywhere
    decoy = " and c = 'emp.secret'" if (where and rng.random() < 0.3) \
        else ""
    return f"select {sel} {' '.join(items)}{where}{decoy}", correlated


def test_generated_cases_seeded():
    rng = random.Random(1104)
    n_corr = n_unc = 0
    for i in range(400):
        sub, want = _gen_case(rng)
        got = guard(sub)
        assert got is want, (
            f"case {i}: guard said {got}, built {'' if want else 'un'}"
            f"correlated:\n  {sub}")
        n_corr += want
        n_unc += not want
    # both labels must actually be exercised
    assert n_corr > 100 and n_unc > 100


def test_quantified_and_exists_wrappers():
    """The guard sees only the subquery BODY, whatever wrapper
    (IN/SOME/ALL/EXISTS) the caller strips — but wrappers can nest
    inside the body; pin that nested wrapped subqueries resolve their
    own aliases and outer refs still surface."""
    for kw in ("in", "= some", ">= all", "exists"):
        body = (f"select x from t where t.k {kw} "
                f"(select k from u where u.j = t.j)")
        assert guard(body) is False, kw
        body_corr = (f"select x from t where t.k {kw} "
                     f"(select k from u where u.j = emp.j)")
        assert guard(body_corr) is True, kw
