"""MATCH_RECOGNIZE — SQL row-pattern matching as a distributed operator.

Reference parity: rel/core/Match.java:57-72 (pattern, DEFINE predicates,
MEASURES, AFTER MATCH, PARTITION/ORDER) executed by an NFA at runtime
(runtime/Automaton.java, runtime/Matcher.java, runtime/Pattern.java,
adapter/enumerable/EnumerableMatch.java:66). Semantics re-implemented from
the SQL:2016 spec — no code ported; the reference's Java NFA is replaced by a
per-partition backtracking matcher over Arrow-batched pandas groups.

Scale notes: partitions are shuffled by PARTITION BY keys via
``applyInPandas`` — the same distribution Calcite's Match declares
(one pattern partition never spans workers). State is bounded by the
partition, exactly like the reference; skew in partition sizes is the
operational limit (same as any groupBy).

Supported subset (documented, tested):
- pattern: concatenation of symbols with greedy quantifiers ``+ * ? {m,n}``
  and alternation ``|`` at the top level of a group, e.g. ``"STRT DOWN+ UP+"``.
- DEFINE: per-symbol vectorized predicates ``f(pdf) -> bool Series`` over the
  ordered partition (use ``.shift()`` for PREV/NEXT-style references).
- AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW.
- ONE ROW PER MATCH via ``measures`` (callables over the matched slice).
- ALL ROWS PER MATCH (``rows_per_match="all"``): one output row per matched
  input row, with the implicit MATCH_NUMBER() (``match_no``, 1-based per
  partition) and CLASSIFIER() (``classifier``, the symbol that matched the
  row) columns plus input-column passthrough; measures are evaluated with
  FINAL semantics (per-match scalars repeated on every row) — RUNNING
  measures are not supported.
- SUBSET name = (members…) (rel/core/Match.java:60: ``subsets``): union
  symbols usable in measures — ``match_rows[name]`` is the sorted union of
  the member symbols' row lists.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

Predicate = Callable[[pd.DataFrame], "pd.Series"]
Measure = Callable[[pd.DataFrame, dict[str, list[int]]], Any]


# ------------------------------------------------------------- pattern parser
class _Tok:
    def __init__(self, sym: str, lo: int, hi: int | None):
        self.sym, self.lo, self.hi = sym, lo, hi  # hi=None → unbounded

    def __repr__(self):
        return f"{self.sym}{{{self.lo},{self.hi}}}"


_QUANT = {"+": (1, None), "*": (0, None), "?": (0, 1)}


def _parse_pattern(pattern: str) -> list[list[_Tok]]:
    """Parse 'A B+ C*' (with top-level '|' alternation) into alternative
    token sequences. Returns a list of alternatives."""
    alts = []
    for branch in pattern.split("|"):
        toks: list[_Tok] = []
        for piece in branch.split():
            m = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)([+*?]|\{(\d+),(\d+)\})?", piece)
            if not m:
                raise ValueError(f"unsupported pattern element: {piece!r}")
            sym, q = m.group(1), m.group(2)
            if q is None:
                lo, hi = 1, 1
            elif q in _QUANT:
                lo, hi = _QUANT[q]
            else:
                lo, hi = int(m.group(3)), int(m.group(4))
            toks.append(_Tok(sym, lo, hi))
        alts.append(toks)
    return alts


# ------------------------------------------------------------------- matcher
def _match_here(symrows: list[set], toks: list[_Tok], i: int,
                assign: list[tuple[str, int]]) -> list[tuple[str, int]] | None:
    """Greedy backtracking match of token list starting at row i.
    Returns the assignment [(symbol, row_idx), ...] or None."""
    if not toks:
        return assign
    tok, rest = toks[0], toks[1:]
    n = len(symrows)
    # count max consecutive rows matching tok.sym from i
    max_take = 0
    while (i + max_take < n and tok.sym in symrows[i + max_take]
           and (tok.hi is None or max_take < tok.hi)):
        max_take += 1
    # greedy: try longest first
    for take in range(max_take, tok.lo - 1, -1):
        sub = assign + [(tok.sym, j) for j in range(i, i + take)]
        out = _match_here(symrows, rest, i + take, sub)
        if out is not None:
            return out
    return None


def _find_matches(symrows: list[set], alternatives: list[list[_Tok]],
                  skip_past_last: bool) -> list[dict[str, list[int]]]:
    """Scan the partition left-to-right; at each start row try each
    alternative (in order), greedy within an alternative — SQL:2016
    leftmost-match, AFTER MATCH SKIP semantics."""
    matches = []
    i, n = 0, len(symrows)
    while i < n:
        assign = None
        for alt in alternatives:
            assign = _match_here(symrows, alt, i, [])
            if assign:
                break
        if assign:
            rows: dict[str, list[int]] = {}
            for sym, j in assign:
                rows.setdefault(sym, []).append(j)
            all_rows = sorted(j for _, j in assign)
            rows["*"] = all_rows
            matches.append(rows)
            i = (all_rows[-1] + 1) if skip_past_last else (all_rows[0] + 1)
        else:
            i += 1
    return matches


# ------------------------------------------------------------------ operator
def match_recognize(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    pattern: str,
    define: dict[str, Predicate],
    measures: dict[str, Measure],
    output_schema: str,
    after_match: str = "skip_past_last_row",
    rows_per_match: str = "one",
    subset: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Distributed MATCH_RECOGNIZE. Measures receive
    ``(ordered_partition_pdf, match_rows)`` where ``match_rows`` maps
    symbol → row indices ('*' = all matched rows; SUBSET names included).

    ``rows_per_match="one"`` (default): one output row per match; the
    output columns are exactly the measures.

    ``rows_per_match="all"``: one output row per MATCHED INPUT ROW. Output
    columns (declared in ``output_schema``) resolve in priority order:
    ``match_no`` → MATCH_NUMBER(), ``classifier`` → CLASSIFIER(), a measure
    name → that measure's FINAL value repeated per row, anything else → the
    input column of the same name at the matched row.

    Example (V-shape detection)::

        match_recognize(
            events, ["user_id"], ["ts"],
            pattern="STRT DOWN+ UP+",
            define={
                "STRT": lambda p: pd.Series(True, index=p.index),
                "DOWN": lambda p: p["value"] < p["value"].shift(1),
                "UP":   lambda p: p["value"] > p["value"].shift(1),
            },
            measures={
                "user_id":  lambda p, m: p["user_id"].iloc[0],
                "start_id": lambda p, m: p["event_id"].iloc[m["*"][0]],
                "bottom":   lambda p, m: p["value"].iloc[m["DOWN"][-1]],
                "end_id":   lambda p, m: p["event_id"].iloc[m["*"][-1]],
            },
            output_schema="user_id long, start_id long, bottom double, end_id long",
        )
    """
    if after_match not in ("skip_past_last_row", "skip_to_next_row"):
        raise ValueError(f"unsupported AFTER MATCH mode: {after_match}")
    if rows_per_match not in ("one", "all"):
        raise ValueError(f"unsupported ROWS PER MATCH mode: {rows_per_match}")
    alternatives = _parse_pattern(pattern)
    skip_past = after_match == "skip_past_last_row"
    part_cols, order_cols = list(partition_by), list(order_by)
    meas_items = list(measures.items())
    subsets = {k: list(v) for k, v in (subset or {}).items()}
    # output column order comes from the declared schema in ALL ROWS mode
    out_cols = (
        [c.strip().split()[0] for c in output_schema.split(",")]
        if rows_per_match == "all" else [k for k, _ in meas_items]
    )

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({k: [] for k in out_cols})
        # classify every row for every symbol (vectorized; NaN → False)
        sym_masks = {}
        for sym, pred in define.items():
            s = pred(pdf)
            sym_masks[sym] = s.fillna(False).astype(bool).to_numpy()
        symrows = [
            {sym for sym, mask in sym_masks.items() if mask[i]} for i in range(n)
        ]
        out_rows = []
        for match_no, m in enumerate(_find_matches(symrows, alternatives,
                                                   skip_past), start=1):
            for name, members in subsets.items():
                m[name] = sorted({j for s in members for j in m.get(s, [])})
            if rows_per_match == "one":
                out_rows.append({k: fn(pdf, m) for k, fn in meas_items})
                continue
            classifier = {j: sym for sym, rows_ in m.items()
                          if sym in define for j in rows_}
            final = {k: fn(pdf, m) for k, fn in meas_items}
            for j in m["*"]:
                row = {}
                for col in out_cols:
                    if col == "match_no":
                        row[col] = match_no
                    elif col == "classifier":
                        row[col] = classifier.get(j)
                    elif col in final:
                        row[col] = final[col]
                    else:
                        row[col] = pdf[col].iloc[j]
                out_rows.append(row)
        return pd.DataFrame(out_rows, columns=out_cols)

    return df.groupBy(*part_cols).applyInPandas(process, schema=output_schema)
