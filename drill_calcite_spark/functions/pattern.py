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

# characters that pass through unchanged as SIMILAR TO operators; braces
# are handled separately so only well-formed {m} / {m,} / {m,n} quantifiers
# reach the regex engine (a stray brace is invalid in SQL:2003 §8.6 and
# would also be rejected by Java regex/RE2 at run time — fail at translate
# time instead, like Calcite's runtime "invalid regular expression").
_PASSTHROUGH = set("|*+?()")

_BRACE_QUANT = re.compile(r"\{(\d+)(,(\d*))?\}")


def similar_to_regex(pattern: str, escape: str | None = None) -> str:
    """Translate a SQL SIMILAR TO ``pattern`` into an anchored regex string.

    ``escape``, if given, must be a single character; in the pattern it makes
    the following character literal (the SQL ESCAPE clause).
    """
    if escape is not None and len(escape) != 1:
        raise ValueError("SIMILAR TO escape must be a single character")
    out: list[str] = []
    in_class = False
    # does the last emitted element end in a quantifiable atom? (a brace
    # quantifier with nothing to repeat is invalid SQL:2003 and a Java
    # regex PatternSyntaxException — reject at translate time)
    prev_atom = False
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
            prev_atom = True
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
                prev_atom = True
        elif c == "[":
            in_class = True
            out.append(c)
            prev_atom = False
        elif c == "%":
            out.append(".*")
            prev_atom = False  # already quantified: a{2} after % is dangling
        elif c == "_":
            out.append(".")
            prev_atom = True
        elif c == "{":
            m = _BRACE_QUANT.match(pattern, i)
            if not m:
                raise ValueError(
                    f"invalid brace quantifier in SIMILAR TO pattern at "
                    f"position {i}: {pattern!r} (expected {{m}}, {{m,}} or "
                    f"{{m,n}})"
                )
            if not prev_atom:
                raise ValueError(
                    f"brace quantifier with nothing to repeat at position "
                    f"{i}: {pattern!r}"
                )
            # {m,n} with n < m passes the shape check but is a run-time
            # PatternSyntaxException — reject at translate time too
            if m.group(3):
                lo, hi = int(m.group(1)), int(m.group(3))
                if hi < lo:
                    raise ValueError(
                        f"brace quantifier {{{lo},{hi}}} has max < min at "
                        f"position {i}: {pattern!r}"
                    )
            out.append(m.group(0))
            prev_atom = False
            i = m.end()
            continue
        elif c == "}":
            raise ValueError(
                f"unmatched '}}' in SIMILAR TO pattern at position {i}: "
                f"{pattern!r}"
            )
        elif c in _PASSTHROUGH:
            out.append(c)
            prev_atom = c == ")"
        else:
            out.append(re.escape(c))
            prev_atom = True
        i += 1
    if in_class:
        raise ValueError(f"unterminated character class in pattern: {pattern!r}")
    return "^(?:" + "".join(out) + ")$"
