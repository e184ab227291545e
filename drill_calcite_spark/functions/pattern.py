"""SQL pattern-language translators: SIMILAR TO → regex.

Re-expresses the reference's SIMILAR TO operator
(core/src/main/java/org/apache/calcite/sql/fun/SqlStdOperatorTable.java:1367-1370,
runtime in core/src/main/java/org/apache/calcite/runtime/SqlFunctions.java
``similar``) for Spark: SQL:2003 SIMILAR TO patterns become anchored Java
regexes usable with ``Column.rlike``.

SIMILAR TO pattern language (ISO/IEC 9075-2 §8.6):
- ``%`` matches any string, ``_`` any single character (as in LIKE);
- regex-style operators ARE part of the language: alternation ``|``,
  quantifiers ``* + ? {m} {m,} {m,n}``, grouping ``()``, character classes
  ``[...]`` / ``[^...]``;
- every other character — including ``.``, ``^``, ``$`` which are regex
  metacharacters — matches itself literally;
- an optional ESCAPE character makes the next character literal;
- the match is ANCHORED: the whole string must match.
"""

from __future__ import annotations

import re

# characters that pass through unchanged as SIMILAR TO operators
# ({m,n} brace contents — digits, comma — survive re.escape untouched)
_PASSTHROUGH = set("|*+?(){}")


def similar_to_regex(pattern: str, escape: str | None = None) -> str:
    """Translate a SQL SIMILAR TO ``pattern`` into an anchored regex string.

    ``escape``, if given, must be a single character; in the pattern it makes
    the following character literal (the SQL ESCAPE clause).
    """
    if escape is not None and len(escape) != 1:
        raise ValueError("SIMILAR TO escape must be a single character")
    out: list[str] = []
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if escape is not None and c == escape and not in_class:
            if i + 1 >= n:
                raise ValueError(
                    f"SIMILAR TO pattern ends with escape character: {pattern!r}"
                )
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if in_class:
            # class contents are regex-compatible already (ranges, leading ^);
            # only a backslash needs neutralizing — SQL classes have no escapes
            if c == "\\":
                out.append("\\\\")
            else:
                out.append(c)
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
            out.append(c)
        elif c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c in _PASSTHROUGH:
            out.append(c)
        else:
            out.append(re.escape(c))
        i += 1
    if in_class:
        raise ValueError(f"unterminated character class in pattern: {pattern!r}")
    return "^(?:" + "".join(out) + ")$"
