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

    Only n=2 is needed today; the 2-gram form zips the token list against
    itself shifted by one, which both engines express as slice+zip.
    Oracle: list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                           s -> s[1] || ' ' || s[2])
    """
    if n != 2:
        raise NotImplementedError("only 2-gram shingles are wired up")
    # Clamp the slice length at 0: an empty/whitespace-only document has
    # size(toks)=0 and slice(…, -1) throws at runtime.
    ln = F.greatest(F.lit(0), F.size(toks) - 1)
    left = F.slice(toks, 1, ln)
    right = F.slice(toks, 2, ln)
    return F.zip_with(left, right, lambda a, b: F.concat(a, F.lit(" "), b))


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
