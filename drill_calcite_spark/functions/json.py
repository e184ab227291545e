"""MySQL-style JSON utility functions the reference exposes through
SqlLibraryOperators (JSON_DEPTH / JSON_PRETTY / JSON_REMOVE /
JSON_STORAGE_SIZE — core/src/main/java/org/apache/calcite/runtime/
JsonFunctions.java jsonDepth/jsonPretty/jsonRemove/jsonStorageSize).

Spark has none of these built in, and their generic form needs a JSON parse.
We stay in pure column algebra (whole-stage codegen, no UDFs) with a
single-pass character scan via ``F.aggregate`` over ``F.split(j, '')``,
under documented per-function preconditions:

- ``json_depth``: no '{', '}', '[', ']' inside string values, and no
  whitespace inside EMPTY containers. Whitespace elsewhere (e.g. the
  driver's ``props`` column, '{"k": 87}') is harmless: any character in a
  non-empty container witnesses a depth its container already implies.
- ``json_pretty`` / ``json_storage_size`` (as a compact-bytes measure):
  strictly COMPACT documents — additionally no whitespace anywhere
  outside strings, and no ',' / ':' / whitespace inside string values
  (the scan cannot tell a structural comma from one in a string). This
  holds for ``to_json`` output over identifier-ish fields — the
  engine-generated documents the batteries feed it — but NOT for
  arbitrary user text; route free-text payloads through a parse-based
  path instead.
- no escaped quotes anywhere (both scans).

The preconditions are ENFORCED at runtime by default (``strict=True``):
input that violates them raises a per-row error (``F.raise_error``)
instead of silently producing a wrong number — the same fail-loudly
contract pattern.py and geo.py follow at translate time. The strict
check is a single anchored regex (alternating quoted/unquoted spans;
conservatively rejects ANY backslash, since an escape can hide a quote
from the span decomposition). Pass ``strict=False`` only when the input
is engine-generated and the check's scan cost matters.

Empty/blank input: ``json_depth`` returns NULL (invalid JSON — MySQL
errors; NULL is the engine's non-error analogue and matches a
max-over-zero-rows oracle scan). ``json_pretty``/``json_storage_size``
pass blanks to the strict guard, which rejects them (whitespace outside
a string).

Within those contracts the scans are exact:

- depth: running bracket nesting; an opener at new nesting n witnesses
  depth n (covers empty containers), any other non-closer character at
  nesting n witnesses depth n+1 (a non-empty container always holds a
  scalar, key, or deeper opener). Matches MySQL JSON_DEPTH on all its
  documented cases ('{}'→1, '[1]'→2, scalar→1, ...).
- pretty: MySQL/Jackson 2-space style — newline+indent after openers and
  commas, newline+indent before closers, ': ' after key colons. Byte-equal
  to python ``json.dumps(indent=2)`` on compact input (unit-tested).

The DuckDB oracle twins in queries/funcs.py run the identical algorithm as
a per-position prefix-count scan (DuckDB's RE2 regexes have no
backreferences, and its lambda aggregate lacks an initial accumulator, so
the oracle uses ``range(...)`` + ``string_agg ORDER BY i`` instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_OPENS = ("{", "[")
_CLOSES = ("}", "]")

# plenty for any engine-generated doc; substr clamps, never throws
_INDENT_POOL = " " * 80


def _chars(j: F.Column) -> F.Column:
    return F.split(j, "")


# Anchored alternating-span decompositions: in quote-balanced text with no
# backslashes, the 2nd/4th/... quote-delimited spans ARE the string values,
# so "no X inside strings" is one full-match regex (no backreferences —
# runs identically under Java regex; see [[duckdb-spark-parity-gotchas]]).
_DEPTH_OK = r'^([^"\\]*"[^"{}\[\]\\]*")*[^"\\]*$'
_COMPACT_OK = r'^([^"\s\\]*"[^",:{}\[\]\s\\]*")*[^"\s\\]*$'


def _strict_guard(j: F.Column, ok_pattern: str, name: str,
                  result: F.Column) -> F.Column:
    """Fail-loudly wrapper: rows violating the scan precondition raise
    (CASE WHEN branches evaluate lazily, so conforming rows never pay the
    error path); NULL input stays NULL."""
    return (
        F.when(j.isNull(), F.lit(None))
        .when(j.rlike(ok_pattern), result)
        .otherwise(F.raise_error(F.concat(
            F.lit(f"{name}: input violates the compact-JSON scan "
                  "precondition (see drill_calcite_spark/functions/json.py; "
                  "route arbitrary documents through from_json): "),
            F.substr(j, F.lit(1), F.lit(80)),
        )))
    )


def json_depth(j: F.Column, strict: bool = True) -> F.Column:
    """JSON_DEPTH(j) — maximum nesting depth (MySQL semantics); NULL in,
    NULL out; empty/blank in, NULL out (invalid JSON — see module head).
    Single pass: acc.n = bracket nesting, acc.d = best depth. With
    ``strict`` (default), input with brackets-in-strings or any backslash
    raises instead of silently miscounting."""

    def step(acc: F.Column, c: F.Column) -> F.Column:
        n2 = acc.n + F.when(c.isin(*_OPENS), 1).when(c.isin(*_CLOSES), -1).otherwise(0)
        # openers witness n2 == acc.n + 1; other non-closers witness acc.n + 1
        cand = F.when(c.isin(*_CLOSES) | (c == ""), acc.d).otherwise(acc.n + 1)
        return F.struct(n2.alias("n"), F.greatest(acc.d, cand).alias("d"))

    scan = F.aggregate(
        _chars(j),
        F.struct(F.lit(0).alias("n"), F.lit(0).alias("d")),
        step,
        lambda acc: acc.d.cast("bigint"),
    )
    blank_null = F.when(F.length(F.trim(j)) > 0, scan).cast("bigint")
    if not strict:
        return blank_null
    return _strict_guard(j, _DEPTH_OK, "json_depth", blank_null).cast("bigint")


def json_pretty(j: F.Column, strict: bool = True) -> F.Column:
    """JSON_PRETTY(j) — 2-space-indent pretty printing of a compact JSON
    document (Jackson DefaultPrettyPrinter style, as Calcite's jsonPretty).
    With ``strict`` (default), non-compact input raises (module head)."""

    def indent(n: F.Column) -> F.Column:
        return F.substr(F.lit(_INDENT_POOL), F.lit(1), n * 2)

    def step(acc: F.Column, c: F.Column) -> F.Column:
        n2 = acc.n + F.when(c.isin(*_OPENS), 1).when(c.isin(*_CLOSES), -1).otherwise(0)
        frag = (
            F.when(c.isin(*_OPENS), F.concat(c, F.lit("\n"), indent(n2)))
            .when(c.isin(*_CLOSES), F.concat(F.lit("\n"), indent(n2), c))
            .when(c == ",", F.concat(F.lit(",\n"), indent(acc.n)))
            .when(c == ":", F.lit(": "))
            .when(c == "", F.lit(""))
            .otherwise(c)
        )
        return F.struct(n2.alias("n"), F.concat(acc.out, frag).alias("out"))

    scan = F.aggregate(
        _chars(j),
        F.struct(F.lit(0).alias("n"), F.lit("").alias("out")),
        step,
        lambda acc: acc.out,
    )
    if not strict:
        return scan
    return _strict_guard(j, _COMPACT_OK, "json_pretty", scan).cast("string")


_REGEX_META = set("\\^$.|?*+()[]{}")


def _regex_quote(s: str) -> str:
    """Escape regex metacharacters (Java regex and RE2 agree on
    backslash-escaped punctuation; alphanumerics stay bare because Java
    rejects undefined alphanumeric escapes)."""
    return "".join("\\" + c if c in _REGEX_META else c for c in s)


def json_remove_key(j: F.Column, key: str) -> F.Column:
    """JSON_REMOVE(j, '$.key') for a top-level key with a scalar or string
    value (the engine-generated-document subset; nested values would need
    balanced matching that regexes can't express). Removes the pair with its
    separating comma; a leading '{,' from removing the first key is fixed
    up. The key is regex-quoted, so dots and other metacharacters in key
    names match literally. The oracle runs the byte-identical regex in
    DuckDB."""
    pat = ',?"' + _regex_quote(key) + '":("[^"]*"|[^,}\\]]*)'
    return F.replace(
        F.regexp_replace(j, pat, ""), F.lit("{,"), F.lit("{")
    )


def json_storage_size(j: F.Column, strict: bool = True) -> F.Column:
    """JSON_STORAGE_SIZE(j) — bytes of the serialized document. Calcite
    returns Jackson's serialized byte length (JsonFunctions.jsonStorageSize);
    for an already-compact document that is its octet length. With
    ``strict`` (default), non-compact input raises rather than returning
    the padded length (module head)."""
    if not strict:
        return F.octet_length(j).cast("bigint")
    return _strict_guard(
        j, _COMPACT_OK, "json_storage_size", F.octet_length(j)
    ).cast("bigint")
