"""Text tokenization / hashing column builders (pure pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly; no Python UDFs).

Every builder here is replicated 1:1 in the DuckDB oracle SQL of
queries/llm.py, so results are engine-portable by construction: hashing is
md5-hex (identical bytes both engines), folds are ordered left-folds
(F.aggregate ≡ DuckDB list_reduce), and string comparison is bytewise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 2_147_483_647  # 2^31-1; keeps acc*131+v inside int64
FINGERPRINT_INIT = 7
FINGERPRINT_MULT = 131


def tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (order preserved).

    Oracle: list_filter(string_split(text, ' '), x -> x <> '')
    """
    return F.filter(F.split(text, " "), lambda x: x != "")


def shingles(toks: Column, n: int = 2) -> Column:
    """Word n-gram shingles (space-joined), order preserved, may repeat.

    n=2 keeps the proven zip form (the one every dedup oracle replays):
    Oracle: list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                           s -> s[1] || ' ' || s[2])

    n≥3 uses an index-window transform; documents shorter than n yield [].
    Oracle: CASE WHEN len(t) >= n THEN list_transform(
                generate_series(1, len(t)-(n-1)),
                i -> t[i] || ' ' || … || t[i+n-1]) ELSE [] END
    """
    if n < 2:
        raise ValueError("shingle size must be >= 2")
    if n == 2:
        # Clamp the slice length at 0: an empty/whitespace-only document has
        # size(toks)=0 and slice(…, -1) throws at runtime.
        ln = F.greatest(F.lit(0), F.size(toks) - 1)
        left = F.slice(toks, 1, ln)
        right = F.slice(toks, 2, ln)
        return F.zip_with(left, right, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_cast(col: Column, n: int) -> Column:
    """CAST(x AS CHAR(n)) with SQL fixed-width semantics
    (reference: sql/type/SqlTypeName.java:98 — CHAR is fixed-width,
    blank-padded; Spark's StringType has no pad semantics, so the cast is
    emulated): truncate to n characters, right-pad with spaces to exactly n.

    Oracle: rpad(substr(x, 1, n), n, ' ')
    """
    return F.rpad(F.substring(col, 1, n), n, " ")


def char_eq(a: Column, b: Column) -> Column:
    """SQL PAD SPACE comparison for CHAR values: the shorter operand is
    notionally blank-padded to the longer's length, so values differing
    only in trailing spaces compare equal. Emulated as rtrim-equality —
    identical to pad-compare for all printable data (only control
    characters below 0x20 could order differently, and CHAR data
    containing them is out of scope).

    Oracle: rtrim(a, ' ') = rtrim(b, ' ')
    """
    return F.rtrim(a) == F.rtrim(b)


def token_values(toks: Column) -> Column:
    """Deterministic int64 value per token: length*31 + codepoint(first char).

    Oracle: list_transform(t, x -> (length(x)*31 + ascii(x))::BIGINT)
    """
    return F.transform(
        toks, lambda x: (F.length(x) * 31 + F.ascii(x)).cast("bigint")
    )


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over the token sequence (document
    fingerprint): acc = (acc*131 + value(token)) mod 2^31-1, acc0 = 7.
    Order-sensitive — re-ordered documents fingerprint differently.

    Oracle: list_reduce(list_concat([7]::BIGINT[], <token_values>),
                        (a, b) -> (a*131 + b) % 2147483647)
    """
    return F.aggregate(
        token_values(toks),
        F.lit(FINGERPRINT_INIT).cast("bigint"),
        lambda acc, v: (acc * FINGERPRINT_MULT + v) % FINGERPRINT_MOD,
    )
