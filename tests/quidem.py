"""Minimal quidem-script reader + result comparator for tests/iq/.

The reference's end-to-end conformance layer is quidem scripts
(core/src/test/resources/sql/*.iq, run by CoreQuidemTest.java): SQL text
followed by the expected result rendered as a mysql-style table, closed
by ``!ok``. This module parses that exact format so tests/test_quidem.py
can replay the reference's own cases against this engine.

Comparison is ORDER-INSENSITIVE (multiset of rows): Calcite's expected
tables freeze one physical tie-order and one null-collation; the
engine's ordering semantics are pinned separately (sql.py nulls-high
rewrite + the rank/row_number VALUES inside rows, which encode ordering
in data). Numeric cells compare with 1e-9 tolerance; NULL renders as an
empty cell; booleans as true/false; structs as Calcite's {a, b} form.
"""

from __future__ import annotations

import datetime
import math
import re
from decimal import Decimal

from pyspark.sql import Row

_SQL_KW = re.compile(r"^\s*(select|with|values)\b", re.I)
_SETUP_KW = re.compile(r"^\s*(create|insert|update|delete|drop|merge)\b",
                       re.I)


def _parse_mysql_table(block: list[str]):
    lines = [ln.rstrip() for ln in block if ln.strip()]
    if not lines or not lines[0].startswith("+-"):
        return None
    header = lines[1]
    cols = [c.strip() for c in header.strip("|").split("|")]
    if len(lines) < 3 or not lines[2].startswith("+"):
        return None
    rows, k = [], 3
    while k < len(lines) and lines[k].startswith("|"):
        body = lines[k][1:-1] if lines[k].endswith("|") else lines[k][1:]
        cells = [c.strip() for c in body.split("|")]
        if len(cells) != len(cols):
            return None
        rows.append([None if c == "" else c for c in cells])
        k += 1
    if k >= len(lines) or not lines[k].startswith("+"):
        return None
    m = (re.search(r"\((\d+) rows?\)", lines[k + 1])
         if k + 1 < len(lines) else None)
    if m and int(m.group(1)) != len(rows):
        return None
    return cols, rows


_TRUNC = re.compile(r"^(.*)\.\.\. \((\d+) characters\)$")


def _parse_csv_table(block: list[str]):
    """Quidem's ``!set outputformat csv`` rendering (spatial.iq): a
    header line of comma-space-separated column names, then one line
    per row. NULL renders as the text ``null``; a cell longer than
    quidem's limit renders as ``<prefix>... (N characters)`` — kept as
    a ("__trunc__", prefix, length) marker that cells_eq checks by
    prefix + total length."""
    lines = [ln for ln in block if ln.strip()]
    if len(lines) < 1 or lines[0].startswith(("+", "|")):
        return None
    cols = [c.strip() for c in lines[0].split(", ")]
    rows = []
    for ln in lines[1:]:
        if len(cols) == 1:
            cells = [ln.strip()]
        else:
            cells = [c.strip() for c in ln.split(", ")]
            if len(cells) != len(cols):
                return None
        out = []
        for c in cells:
            m = _TRUNC.match(c)
            if m:
                out.append(("__trunc__", m.group(1), int(m.group(2))))
            else:
                out.append(None if c == "null" else c)
        rows.append(out)
    return cols, rows


def parse_iq(path: str) -> list[dict]:
    """Parse a quidem script into cases: {file, line, sql, cols, rows}.
    ``!if (false) { ... !}`` blocks are skipped (disabled in the
    reference's own runs); only ``!ok`` verdicts with a well-formed
    mysql-format or csv-format table become cases."""
    lines = open(path).read().splitlines()
    cases, setups, i, disabled = [], [], 0, 0
    use = next((ln.split(None, 1)[1].strip() for ln in lines
                if ln.startswith("!use ")), None)

    def read_block():
        nonlocal i
        block = []
        while i < len(lines) and not lines[i].startswith("!"):
            # a new DDL/DML statement beginning means the previous one
            # carried NO verdict — quidem never executes verdict-less
            # statements (table_as.iq's bare `drop table d4;`), so
            # neither do we. Only setup keywords stop the block: an
            # expected block may itself start with SELECT text
            # (redshift.iq's !explain-validated-on blocks hold the
            # validated SQL).
            if _SETUP_KW.match(lines[i]):
                return block, ""
            block.append(lines[i])
            i += 1
        verdict = lines[i].strip() if i < len(lines) else ""
        i += 1
        return block, verdict

    while i < len(lines):
        line = lines[i]
        if re.match(r"!if\s*\(false\)", line):
            disabled += 1
            i += 1
            continue
        if disabled:
            if line.strip() == "!}":
                disabled -= 1
            i += 1
            continue
        is_setup = bool(_SETUP_KW.match(line))
        if not (_SQL_KW.match(line) or is_setup):
            i += 1
            continue
        stmt, start = [], i
        while i < len(lines):
            stmt.append(lines[i])
            if lines[i].rstrip().endswith(";"):
                i += 1
                break
            i += 1
        sql = "\n".join(stmt).rstrip().rstrip(";")
        block, verdict = read_block()
        if is_setup:
            # DDL/DML followed by "(N rows modified)" + !update: record
            # as ordered setup state for the cases that follow
            # (blank.iq's create-table/insert preludes)
            if verdict == "!update":
                setups.append(sql)
            continue
        # a case may print its plan first or last: `!plan` blocks wrap
        # the result table (blank.iq's CALCITE-1493 battery,
        # materialized_view.iq's exact-match case); `!type` terminates
        # a case without a result table (table.iq) — not a case here
        while verdict == "!plan":
            block, verdict = read_block()
        if verdict == "!ok":
            exp = _parse_mysql_table(block) or _parse_csv_table(block)
            if exp:
                cases.append({"file": path.rsplit("/", 1)[-1],
                              "line": start + 1, "sql": sql,
                              "cols": exp[0], "rows": exp[1],
                              "setup": tuple(setups), "use": use})
                if re.search(r"\bnext\s+value\s+for\b", sql, re.I):
                    # sequence statements are STATEFUL: later cases in
                    # the same script observe the drained counter
                    # (sequence.iq's CURRENT VALUE case), so replay this
                    # statement as a tagged setup when a later case runs
                    # standalone
                    setups.append("--seq-stateful--\n" + sql)
    return cases


def norm_cell(v):
    """Normalize an engine value to quidem's rendering domain."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Row):
        return _row_text(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, list):
        # Calcite COLLECT/FUSION produce MULTISETS (unordered): compare
        # as a sorted element multiset, rendered Calcite-style
        return ("__multiset__", tuple(sorted(_elem_text(x) for x in v)))
    return str(v)


def _elem_text(x) -> str:
    if x is None:
        return "null"
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, Row):
        return _row_text(x)
    return str(x)


def _row_text(v: Row) -> str:
    """Calcite renders ROW values as {a, b} with unadorned field text."""
    return "{" + ", ".join(_elem_text(x) for x in v) + "}"


def _split_multiset(body: str) -> list[str]:
    """Split a rendered multiset body on commas OUTSIDE {...} structs."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def norm_expected(c):
    if c is None:
        return None
    if isinstance(c, tuple):          # ("__trunc__", prefix, length)
        return c
    if c.startswith("[") and c.endswith("]"):
        # Calcite renders MULTISETs as [..] — but so do JSON strings
        # (JSON_ARRAYAGG). Keep the raw text alongside the sorted
        # multiset view; cells_eq picks by the ENGINE value's type:
        # engine list → unordered multiset compare, engine string →
        # exact JSON text compare (order is part of the JSON value).
        body = c[1:-1].strip()
        elems = _split_multiset(body) if body else []
        return ("__multiset__", tuple(sorted(elems)), c)
    try:
        return float(c)
    except ValueError:
        return c


def cells_eq(a, b) -> bool:
    if isinstance(b, tuple) and len(b) == 3 and b[0] == "__trunc__":
        # quidem-truncated long cell: compare prefix + total length
        return (isinstance(a, str) and len(a) == b[2]
                and a.startswith(b[1]))
    if isinstance(b, tuple) and b and b[0] == "__multiset__":
        if isinstance(a, tuple) and a and a[0] == "__multiset__":
            return a[1] == b[1]
        if isinstance(a, str):
            return len(b) >= 3 and a == b[2]
        return False
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b),
                                rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


def assert_rows_match(got_rows, expected_cells, tag: str) -> None:
    grows = sorted(([norm_cell(v) for v in r] for r in got_rows), key=repr)
    erows = sorted(([norm_expected(c) for c in r] for r in expected_cells),
                   key=repr)
    assert len(grows) == len(erows), (
        f"{tag}: row count {len(grows)} vs expected {len(erows)}")
    for gr, er in zip(grows, erows):
        assert len(gr) == len(er), (
            f"{tag}: column count {len(gr)} vs expected {len(er)}")
        for k, (a, b) in enumerate(zip(gr, er)):
            assert cells_eq(a, b), (
                f"{tag}: col {k}: engine={a!r} expected={b!r}\n"
                f" engine row:   {gr}\n expected row: {er}")
