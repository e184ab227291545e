"""Shared fail-loud guards for operator APIs.

The grouped sketch builders and rankers select internal working
columns UNQUALIFIED (bucket/m/cnt/…): a caller whose group key or
value column reuses one would get an ambiguous-column AnalysisException
deep inside the plan — or, worse, a silently wrong aggregate — instead
of an actionable error at the API boundary. One shared guard keeps the
message and behavior identical across operators (r12 review: three
hand-rolled copies had already appeared).

Note the internal names cannot simply be ``__``-prefixed out of the
collision space: ``bucket_lo``/``cnt``/``bucket``/``m`` are the PUBLIC
schema of the sketch DataFrames callers persist, merge, and oracle
against — they are API, not scratch. The reserved lists enumerate that
API surface per function.
"""

from __future__ import annotations


def assert_cols_clear(cols: "list[str]", reserved: "set[str]",
                      fn: str, what: str = "group key") -> None:
    """Raise ValueError if any caller-supplied column name collides
    with an operator's internal/output column names."""
    clash = sorted(set(cols) & reserved)
    if clash:
        raise ValueError(
            f"{fn}: {what} column(s) {clash} collide with internal "
            f"column names {sorted(reserved)}; rename the column(s) "
            "first")


def assert_nonempty(items: tuple, fn: str, what: str) -> None:
    """Raise ValueError on an empty varargs list instead of letting a
    bare IndexError escape from ``items[0]``."""
    if not items:
        raise ValueError(f"{fn}: at least one {what} is required")
