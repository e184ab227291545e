"""MATCH_RECOGNIZE through the SQL front door.

Translates the SQL-standard row-pattern-matching clause (Calcite:
SqlMatchRecognize / rel/core/Match.java; the TICKER queries in the
reference's match.iq lineage) onto the engine's distributed operator
(operators/match_recognize.py — applyInPandas per partition). The
operator itself has been complete since r7; this module closes the
last §3.1 parse-path gap — a user can now TYPE the reference's
MATCH_RECOGNIZE SQL instead of calling the Python surface.

Supported surface (loud-fail contract — anything outside raises
MatchRecognizeUnsupported, never a silently wrong result):
- PARTITION BY / ORDER BY (column lists)
- MEASURES with: FIRST(X.col[, n]) / LAST(X.col[, n]), X.col (= FINAL
  LAST per the standard's ONE-ROW semantics), bare col (last matched
  row), SUM/MIN/MAX/AVG/COUNT over X.col or X.*, COUNT(*),
  MATCH_NUMBER(), CLASSIFIER() (the latter two in ALL ROWS mode, where
  the operator materializes them)
- ONE ROW PER MATCH (default) / ALL ROWS PER MATCH
- AFTER MATCH SKIP PAST LAST ROW / TO NEXT ROW / TO [FIRST|LAST] var
- PATTERN (...) passed through to the operator's parser (quantifiers,
  alternation, PERMUTE, {-exclusions-}, anchors are its contract)
- SUBSET S = (A, B)
- WITHIN INTERVAL 'n' <unit>
- DEFINE with comparisons/arithmetic over X.col, PREV/NEXT(X.col[, n]),
  literals, AND/OR/NOT

The outer statement (projection, WHERE, ORDER BY around the
MATCH_RECOGNIZE table expression) is handled by substituting the
operator's result as a temp view and running the REST of the text
through the normal Calcite-dialect rewrite — so the full outer SQL
surface keeps working.

DEFINE/MEASURE compilation: SQL expressions become VECTORIZED pandas
expressions (`X.col` → ``p["col"]``, ``PREV(X.col, n)`` →
``p["col"].shift(n)``) evaluated once per partition — the same
vectorized-predicate discipline the hand-written define lambdas use;
nothing row-at-a-time.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class MatchRecognizeUnsupported(Exception):
    pass


_MR_HEAD = re.compile(r"\bmatch_recognize\s*\(", re.I)


def has_match_recognize(text: str) -> bool:
    return bool(_MR_HEAD.search(text))


def _balanced_span(text: str, open_at: int) -> int:
    """End index (exclusive) of the paren group opening at ``open_at``."""
    depth = 0
    for i in range(open_at, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise MatchRecognizeUnsupported("unbalanced parens in MATCH_RECOGNIZE")


_CLAUSE = re.compile(
    r"\b(partition\s+by|order\s+by|measures|one\s+row\s+per\s+match|"
    r"all\s+rows\s+per\s+match|after\s+match|pattern|subset|within|define)\b",
    re.I)


def _split_clauses(body: str) -> "list[tuple[str, str]]":
    """Split the MR body into (clause_keyword, clause_text) pairs at
    paren depth 0."""
    marks = []
    depth = 0
    i = 0
    while i < len(body):
        c = body[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _CLAUSE.match(body, i)
            if m:
                marks.append((m.start(), m.end(),
                              re.sub(r"\s+", " ", m.group(1).lower())))
                i = m.end()
                continue
        i += 1
    out = []
    for k, (s, e, kw) in enumerate(marks):
        nxt = marks[k + 1][0] if k + 1 < len(marks) else len(body)
        out.append((kw, body[e:nxt].strip()))
    return out


def _split_top(text: str, sep: str = ",") -> "list[str]":
    parts, depth, cur = [], 0, []
    for c in text:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


# ---------------------------------------------------------------- DEFINE

# symbol/column groups must START WITH A LETTER — `\w+` would match the
# halves of a decimal literal (`1.5` → sym "1", col "5") and reject any
# DEFINE with a non-integer constant
_NAV = re.compile(r"\b(prev|next)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*"
                  r"([A-Za-z_]\w*)(?:\s*,\s*(\d+))?\s*\)", re.I)
_SYMREF = re.compile(r"\b([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\b")


def _assert_safe_expr(expr: str, original: str) -> None:
    """Whitelist-validate the TRANSLATED condition before it is
    compiled: only the node shapes the translator itself emits —
    ``p["col"]`` subscripts, ``.shift(n)`` navigation, comparisons,
    arithmetic, ``& | ~`` boolean algebra, and plain literals — may
    appear. The DEFINE text reaches this module from arbitrary SQL
    (including the reference's untrusted quidem corpus via resweep), so
    anything outside the grammar — names, calls, attributes,
    f-strings, comprehensions — is rejected loudly instead of being
    handed to the compiler."""
    import ast

    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as exc:
        raise MatchRecognizeUnsupported(
            f"cannot compile DEFINE condition: {original!r} -> {expr!r}"
        ) from exc

    def is_col(node) -> bool:
        return (isinstance(node, ast.Subscript)
                and isinstance(node.value, ast.Name)
                and node.value.id == "p"
                and isinstance(node.slice, ast.Constant)
                and isinstance(node.slice.value, str))

    def is_int(node) -> bool:
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            node = node.operand
        return (isinstance(node, ast.Constant)
                and isinstance(node.value, int))

    _BINOPS = (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod,
               ast.BitAnd, ast.BitOr)
    _UNOPS = (ast.USub, ast.UAdd, ast.Invert)
    _CMPS = (ast.Lt, ast.Gt, ast.LtE, ast.GtE, ast.Eq, ast.NotEq)

    def check(node) -> None:
        if is_col(node):
            return
        if isinstance(node, ast.Constant) and isinstance(
                node.value, (int, float, str, bool, type(None))):
            return
        if isinstance(node, ast.Call):
            # the only call the translator emits: <col>.shift(±n)
            f = node.func
            if not (isinstance(f, ast.Attribute) and f.attr == "shift"
                    and is_col(f.value) and not node.keywords
                    and len(node.args) == 1 and is_int(node.args[0])):
                raise MatchRecognizeUnsupported(
                    f"unsupported DEFINE condition: {original!r}")
            return
        if isinstance(node, ast.BinOp) and isinstance(node.op, _BINOPS):
            check(node.left)
            check(node.right)
            return
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, _UNOPS):
            check(node.operand)
            return
        if isinstance(node, ast.Compare) and all(
                isinstance(op, _CMPS) for op in node.ops):
            check(node.left)
            for c in node.comparators:
                check(c)
            return
        raise MatchRecognizeUnsupported(
            f"unsupported DEFINE condition: {original!r}")

    check(tree.body)


def _compile_define(cond: str, columns: "set[str]"):
    """SQL boolean condition → vectorized ``lambda p: Series``."""
    # shield '...' string literals for the whole transform pipeline —
    # a dot or `=` INSIDE a literal ('x.y', 'a=b') must not be read as
    # a symbol reference or comparison. Placeholders are plain
    # identifiers with no dot, invisible to every pattern below; the
    # bodies are restored as Python string constants just before the
    # AST whitelist runs (which accepts Constant str).
    lit_bodies: "list[str]" = []

    def _shield(m):
        lit_bodies.append(m.group(0)[1:-1].replace("''", "'"))
        return f" __mrlit{len(lit_bodies) - 1}x "

    expr = re.sub(r"'(?:[^']|'')*'", _shield, cond)
    def nav(m):
        fn, _sym, col, n = (m.group(1).lower(), m.group(2),
                            m.group(3), m.group(4) or "1")
        if col not in columns:
            raise MatchRecognizeUnsupported(f"unknown column {col}")
        shift = n if fn == "prev" else f"-{n}"
        return f'p["{col}"].shift({shift})'
    expr = _NAV.sub(nav, expr)
    def symref(m):
        sym, col = m.group(1), m.group(2)
        if sym == "p":  # already-translated fragment
            return m.group(0)
        if col not in columns:
            raise MatchRecognizeUnsupported(
                f"unknown column {col} in DEFINE")
        return f'p["{col}"]'
    expr = _SYMREF.sub(symref, expr)
    expr = _sql_ops_to_pandas(expr)
    expr = re.sub(r"__mrlit(\d+)x",
                  lambda m: repr(lit_bodies[int(m.group(1))]), expr)
    _assert_safe_expr(expr, cond)
    fn = eval(f"lambda p: ({expr})")  # noqa: S307 - whitelist-validated
    return fn


def _split_kw(e: str, kw: str) -> "list[str]":
    """Split at depth-0 occurrences of the word ``kw``."""
    pat = re.compile(rf"\b{kw}\b", re.I)
    parts, depth, cur, i = [], 0, [], 0
    while i < len(e):
        if e[i] == "(":
            depth += 1
        elif e[i] == ")":
            depth -= 1
        m = pat.match(e, i) if depth == 0 else None
        if m:
            parts.append("".join(cur))
            cur = []
            i = m.end()
            continue
        cur.append(e[i])
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts]


def _outer_parens(e: str) -> bool:
    """True when ``e`` is one fully-parenthesized group."""
    if not (e.startswith("(") and e.endswith(")")):
        return False
    depth = 0
    for i, ch in enumerate(e):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i == len(e) - 1
    return False


def _bool_to_pandas(e: str) -> str:
    """AND/OR → & / | with every operand parenthesized (& and | bind
    TIGHTER than comparisons in Python, the classic pandas trap);
    recurses into parenthesized groups so NOT/AND/OR nested under
    parens — ``(NOT (c <= 4)) AND ...`` — translate too (r10; the MR
    fuzzer surfaced the gap)."""
    e = e.strip()
    ors = _split_kw(e, "or")
    if len(ors) > 1:
        return " | ".join(f"({_bool_to_pandas(p)})" for p in ors)
    ands = _split_kw(e, "and")
    if len(ands) > 1:
        return " & ".join(f"({_bool_to_pandas(p)})" for p in ands)
    # NOT binds looser than comparison in SQL: NOT c = 3 is NOT (c = 3),
    # so the negation applies to the WHOLE remaining operand
    m = re.match(r"^\s*not\b(.*)$", e, re.I | re.S)
    if m:
        return _negate(m.group(1).strip())
    if _outer_parens(e):
        return f"({_bool_to_pandas(e[1:-1].strip())})"
    return e


_CMP_FLIP = {"<=": ">", ">=": "<", "<": ">=", ">": "<=",
             "==": "!=", "!=": "=="}
_CMP_TOK = re.compile(r"<=|>=|==|!=|<|>")


def _negate(e: str) -> str:
    """SQL-3VL negation: NOT distributes by De Morgan and lands on each
    comparison atom as an OPERATOR FLIP (``NOT (a <= b)`` ≡ ``a > b``
    — both UNKNOWN when an operand is null, e.g. PREV on a partition's
    first row). A pandas ``~`` would instead turn the null comparison's
    False into True and admit rows SQL rejects."""
    e = e.strip()
    ors = _split_kw(e, "or")
    if len(ors) > 1:
        return " & ".join(f"({_negate(p)})" for p in ors)
    ands = _split_kw(e, "and")
    if len(ands) > 1:
        return " | ".join(f"({_negate(p)})" for p in ands)
    m = re.match(r"^\s*not\b(.*)$", e, re.I | re.S)
    if m:  # double negation
        return _bool_to_pandas(m.group(1).strip())
    if _outer_parens(e):
        return f"({_negate(e[1:-1].strip())})"
    for mt in _CMP_TOK.finditer(e):
        if e[:mt.start()].count("(") == e[:mt.start()].count(")"):
            return e[:mt.start()] + _CMP_FLIP[mt.group(0)] + e[mt.end():]
    raise MatchRecognizeUnsupported(
        f"cannot negate DEFINE term: {e!r}")


def _sql_ops_to_pandas(expr: str) -> str:
    """SQL operators → pandas: <> to !=, = to ==, AND/OR/NOT to & | ~."""
    expr = re.sub(r"<>", "!=", expr)
    expr = re.sub(r"(?<![<>!=])=(?!=)", "==", expr)
    return _bool_to_pandas(expr)


# --------------------------------------------------------------- MEASURES

_AGG = re.compile(r"^(sum|min|max|avg|count)\s*\((.*)\)$", re.I | re.S)
_FL = re.compile(r"^(first|last)\s*\(\s*(\w+)\s*\.\s*(\w+)"
                 r"(?:\s*,\s*(\d+))?\s*\)$", re.I)
_QREF = re.compile(r"^(\w+)\s*\.\s*(\w+)$")


def _measure_body(expr: str, types: "dict[str, str]"):
    """One measure expression → (py_body_over(p,m), spark_type)."""
    e = expr.strip()
    low = e.lower()
    if low == "match_number()":
        return ("__MATCH_NO__", "long")
    if low == "classifier()":
        return ("__CLASSIFIER__", "string")
    m = _FL.match(e)
    if m:
        fn, sym, col, n = (m.group(1).lower(), m.group(2).upper(),
                           m.group(3), int(m.group(4) or 0))
        if col not in types:
            raise MatchRecognizeUnsupported(f"unknown column {col}")
        idx = (f'm["{sym}"][{n}]' if fn == "first"
               else f'm["{sym}"][-1 - {n}]' if n else f'm["{sym}"][-1]')
        return (f'p["{col}"].iloc[{idx}]', types[col])
    m = _AGG.match(e)
    if m:
        fn, arg = m.group(1).lower(), m.group(2).strip()
        if arg == "*":
            if fn != "count":
                raise MatchRecognizeUnsupported(f"{fn}(*) in MEASURES")
            return ('len(m["*"])', "long")
        star = re.match(r"^(\w+)\s*\.\s*\*$", arg)
        if star:
            if fn != "count":
                raise MatchRecognizeUnsupported(f"{fn}(X.*) in MEASURES")
            return (f'len(m["{star.group(1).upper()}"])', "long")
        q = _QREF.match(arg)
        if not q:
            raise MatchRecognizeUnsupported(
                f"unsupported aggregate arg in MEASURES: {arg!r}")
        sym, col = q.group(1).upper(), q.group(2)
        if col not in types:
            raise MatchRecognizeUnsupported(f"unknown column {col}")
        sel = f'p["{col}"].iloc[m["{sym}"]]'
        if fn == "count":
            return (f"{sel}.count()", "long")
        if fn == "avg":
            return (f"{sel}.mean()", "double")
        return (f"{sel}.{fn}()", types[col])
    q = _QREF.match(e)
    if q:
        sym, col = q.group(1).upper(), q.group(2)
        if col not in types:
            raise MatchRecognizeUnsupported(f"unknown column {col}")
        # X.col in MEASURES = FINAL LAST(X.col) (the standard's ONE-ROW
        # reading, which the reference's TICKER queries rely on)
        return (f'p["{col}"].iloc[m["{sym}"][-1]]', types[col])
    if re.fullmatch(r"\w+", e) and e in types:
        # bare column: last matched row (partition keys are constant)
        return (f'p["{e}"].iloc[m["*"][-1]]', types[e])
    raise MatchRecognizeUnsupported(
        f"unsupported MEASURES expression: {expr!r}")


_SPARK_TYPES = {
    "bigint": "long", "int": "long", "smallint": "long", "tinyint": "long",
    "long": "long", "double": "double", "float": "double",
    "string": "string", "boolean": "boolean", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp_ntz",
}


def _norm_type(dt: str) -> str:
    base = dt.split("(")[0].lower()
    if base.startswith("decimal"):
        return dt
    return _SPARK_TYPES.get(base, dt)


_WITHIN = re.compile(
    r"^interval\s+'(\d+)'\s+(second|minute|hour|day)s?$", re.I)

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def translate_match_recognize(spark: SparkSession, text: str) -> DataFrame:
    """Execute a statement containing ``<table> MATCH_RECOGNIZE (...)``:
    run the pattern clause through the distributed operator, then the
    remaining outer SQL through the normal dialect rewrite over the
    operator's result (registered as a temp view)."""
    from drill_calcite_spark.operators.match_recognize import match_recognize
    from drill_calcite_spark.sql import rewrite

    head = _MR_HEAD.search(text)
    open_at = text.index("(", head.start())
    end = _balanced_span(text, open_at)
    body = text[open_at + 1:end - 1]

    # the table expression feeding MATCH_RECOGNIZE: the word before it
    src_m = re.search(r"\bfrom\s+(\w+)\s*$", text[:head.start()], re.I)
    if not src_m:
        raise MatchRecognizeUnsupported(
            "MATCH_RECOGNIZE input must be a plain table/view name")
    src = src_m.group(1)
    df_in = spark.table(src)
    types = {f.name: _norm_type(f.dataType.simpleString())
             for f in df_in.schema.fields}

    clauses = dict(_split_clauses(body))
    if "pattern" not in clauses or "define" not in clauses:
        raise MatchRecognizeUnsupported("PATTERN and DEFINE are required")

    part_cols = ([c.strip() for c in _split_top(clauses["partition by"])]
                 if "partition by" in clauses else [])
    if "order by" not in clauses:
        raise MatchRecognizeUnsupported("ORDER BY is required")
    order_cols = [re.sub(r"\s+(asc|desc)$", "", c.strip(), flags=re.I)
                  for c in _split_top(clauses["order by"])]
    for c in _split_top(clauses["order by"]):
        if re.search(r"\bdesc\b", c, re.I):
            raise MatchRecognizeUnsupported("DESC ordering in MR ORDER BY")

    # PATTERN (...) — strip the outer parens, operator parses the rest
    pat_txt = clauses["pattern"].strip()
    if not (pat_txt.startswith("(") and pat_txt.endswith(")")):
        raise MatchRecognizeUnsupported("PATTERN must be parenthesized")
    pattern = pat_txt[1:-1].strip()

    # WITHIN — either its own clause or trailing the pattern clause
    within = None
    win_txt = clauses.get("within")
    if win_txt:
        m = _WITHIN.match(win_txt.strip())
        if not m:
            raise MatchRecognizeUnsupported(
                f"unsupported WITHIN interval: {win_txt!r}")
        import pandas as pd
        span = pd.Timedelta(
            seconds=int(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()])
        within = (order_cols[0], span)

    # SUBSET S = (A, B), T = (C)
    subset = None
    if "subset" in clauses:
        subset = {}
        for item in _split_top(clauses["subset"]):
            sm = re.match(r"^(\w+)\s*=\s*\(([^)]*)\)$", item.strip())
            if not sm:
                raise MatchRecognizeUnsupported(f"bad SUBSET item: {item!r}")
            subset[sm.group(1).upper()] = [
                s.strip().upper() for s in sm.group(2).split(",")]

    # AFTER MATCH
    after = "skip_past_last_row"
    if "after match" in clauses:
        am = re.sub(r"\s+", " ", clauses["after match"].strip().lower())
        if am == "skip past last row":
            after = "skip_past_last_row"
        elif am == "skip to next row":
            after = "skip_to_next_row"
        else:
            m = re.match(r"^skip to (first|last) (\w+)$", am)
            if not m:
                raise MatchRecognizeUnsupported(
                    f"unsupported AFTER MATCH: {clauses['after match']!r}")
            after = f"skip_to_{m.group(1)} {m.group(2)}"

    rows_all = "all rows per match" in clauses

    # DEFINE
    define = {}
    for item in _split_top(clauses["define"]):
        dm = re.match(r"^(\w+)\s+as\s+(.*)$", item.strip(), re.I | re.S)
        if not dm:
            raise MatchRecognizeUnsupported(f"bad DEFINE item: {item!r}")
        define[dm.group(1).upper()] = _compile_define(
            dm.group(2).strip(), set(types))

    # MEASURES — (alias, python body, spark type)
    meas = []
    if "measures" in clauses:
        for item in _split_top(clauses["measures"]):
            mm = re.match(r"^(.*)\s+as\s+(\w+)$", item.strip(), re.I | re.S)
            if not mm:
                raise MatchRecognizeUnsupported(
                    f"MEASURES items need AS aliases: {item!r}")
            body_txt, alias = mm.group(1).strip(), mm.group(2)
            py, dt = _measure_body(body_txt, types)
            meas.append((alias, py, dt))

    measures = {}
    schema_parts = []
    renames: "dict[str, str]" = {}
    if rows_all:
        # operator resolves the RESERVED names match_no / classifier
        for alias, py, dt in meas:
            if py == "__MATCH_NO__":
                renames[alias] = "match_no"
            elif py == "__CLASSIFIER__":
                renames[alias] = "classifier"
            else:
                measures[alias] = eval(f"lambda p, m: ({py})")  # noqa: S307
        out_cols = []
        for c in df_in.columns:
            out_cols.append((c, types[c]))
        for alias, py, dt in meas:
            name = renames.get(alias, alias)
            if name not in [c for c, _ in out_cols]:
                out_cols.append((name, dt))
        schema_parts = [f"{c} {dt}" for c, dt in out_cols]
    else:
        for alias, py, dt in meas:
            if py in ("__MATCH_NO__", "__CLASSIFIER__"):
                raise MatchRecognizeUnsupported(
                    "MATCH_NUMBER()/CLASSIFIER() need ALL ROWS PER MATCH "
                    "(the one-row mode has no per-row classifier; match "
                    "numbering is not exposed by the operator there)")
        # ONE ROW PER MATCH output = partition keys + measures
        for c in part_cols:
            measures[c] = eval(  # noqa: S307
                f'lambda p, m: p["{c}"].iloc[0]')
            schema_parts.append(f"{c} {types[c]}")
        for alias, py, dt in meas:
            measures[alias] = eval(f"lambda p, m: ({py})")  # noqa: S307
            schema_parts.append(f"{alias} {dt}")

    out = match_recognize(
        df_in, part_cols, order_cols, pattern, define, measures,
        output_schema=", ".join(schema_parts),
        after_match=after,
        rows_per_match="all" if rows_all else "one",
        subset=subset, within=within,
    )
    # user-facing aliases for the reserved ALL-mode names
    for alias, internal in renames.items():
        if alias != internal:
            out = out.withColumnRenamed(internal, alias)

    # splice the operator result back into the outer statement: the
    # replaced span runs from the source table name through the closing
    # paren of MATCH_RECOGNIZE; any alias / WHERE / ORDER BY tail
    # survives verbatim and goes through the normal dialect rewrite.
    view = f"_mr_out_{len(text)}_{len(body)}"
    out.createOrReplaceTempView(view)
    outer = text[:src_m.start(1)] + view + text[end:]
    return spark.sql(rewrite(outer))
