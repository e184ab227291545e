"""Seeded RAND / RAND_INTEGER — Calcite's deterministic PRNG streams
reproduced in pure Catalyst integer arithmetic.

Reference parity: core/src/main/java/org/apache/calcite/runtime/
RandomFunction.java — ``RAND_INTEGER(seed, bound)`` instantiates ONE
``java.util.Random(seed)`` per query (the ``@Deterministic`` constructor
note, RandomFunction.java:33-36) and draws ``nextInt(bound)`` per row;
``RAND(seed)`` seeds ``new Random(seed ^ (seed << 16))``
(RandomFunction.java:48-53) and draws ``nextDouble()``. The streams are
therefore fully deterministic, and the reference pins them in
core/src/test/resources/sql/misc.iq:1878-1955 (four RAND_INTEGER cases +
the ``rand(-1)`` doubles).

``java.util.Random`` is a 48-bit LCG: ``state' = (state * 0x5DEECE66D +
0xB) mod 2^48``, seeded with ``(seed ^ 0x5DEECE66D) mod 2^48``;
``next(b)`` returns the top ``b`` bits (``state >> (48 - b)``).
``nextInt(n)`` draws ``next(31)`` and, for non-power-of-two ``n``,
REJECTS draws in the final partial block (``bits - bits%n + (n-1)``
overflowing int32) and redraws; a power-of-two ``n`` maps one draw as
``(n * next(31)) >> 31``. ``nextDouble()`` consumes two draws:
``(next(26) << 27 | next(27)) / 2^53``.

Spark-first shape — everything below is a scalar Catalyst expression,
ANSI-overflow-safe, no Python at run time:

- The 48-bit multiply is decomposed so no intermediate exceeds 2^60
  (Java wraps silently at 64 bits; Spark 4 ANSI mode would raise):
  ``s*M mod 2^48 = (s.lo24 * M + ((s.hi24 * M.lo24) & mask24) << 24)
  mod 2^48`` — both addends fit a BIGINT.
- Each row at stream position ``p`` folds the LCG forward with
  ``aggregate(sequence(1, p), …)`` — one lambda step per draw, with the
  one-element ``transform(array(x), v -> …)[0]`` let-binding so every
  intermediate state is evaluated once (the geo_sqlfn.py plan-size
  discipline).
- Rejection is unrolled to three tries per draw. P(one rejection) =
  (2^31 mod n)/2^31 ≤ (n-1)/2^31, so three consecutive rejections —
  the only case where this expression diverges from java.util.Random —
  has probability < (n/2^31)^3 (< 1e-26 for n ≤ 10^6) per draw; the
  DuckDB oracle in :func:`duck_rand_cte` implements UNBOUNDED rejection
  via the filtered-stream formulation, so any such divergence would be
  caught, not masked. Unit tests drive a constructed first-try
  rejection through the second-try path.

Scale honesty: a seeded sequential PRNG is ONE stream by definition —
the reference's own execution is single-threaded per query. Position
``p`` comes from ``row_number()`` (enumeration order for the quidem
replays, an explicit key for the registry battery), and the per-row
fold is O(p) ⇒ O(N²) for N rows. This operator is therefore pinned to
small relations (the conformance surface), like the ``sample_bernoulli``
rows-only convention; scale-path deterministic randomness in this repo
is content-hash based (``sample_stratified_quota``'s md5 ranking).
"""

from __future__ import annotations

MASK48 = (1 << 48) - 1
MASK24 = (1 << 24) - 1
MULT = 0x5DEECE66D  # 25214903917
MULT_LO24 = MULT & MASK24  # 15525485
ADD = 0xB
INT_MAX = 2**31 - 1


# --------------------------------------------------------------- Python mirror
def scramble(seed: int) -> int:
    """Random(seed) initial state (java.util.Random.setSeed)."""
    return (seed ^ MULT) & MASK48


def mix_rand_seed(seed: int) -> int:
    """RAND(seed)'s ``seed ^ (seed << 16)`` in int32 arithmetic
    (RandomFunction.java:50 runs on Java ints)."""
    shifted = (seed << 16) & 0xFFFFFFFF
    if shifted >= 2**31:
        shifted -= 2**32
    return seed ^ shifted


def lcg(s: int) -> int:
    return (s * MULT + ADD) & MASK48


def java_random_ints(seed: int, bound: int, count: int) -> list[int]:
    """The exact java.util.Random(seed).nextInt(bound) stream."""
    s, out = scramble(seed), []
    while len(out) < count:
        if bound & (bound - 1) == 0:
            s = lcg(s)
            out.append((bound * (s >> 17)) >> 31)
            continue
        while True:
            s = lcg(s)
            b = s >> 17
            v = b % bound
            if b - v + (bound - 1) <= INT_MAX:
                out.append(v)
                break
    return out


def java_random_doubles(seed: int, count: int, *, premixed: bool = False) -> list[float]:
    """The exact RAND(seed) stream: Random(seed ^ (seed << 16)).nextDouble()."""
    s = scramble(seed if premixed else mix_rand_seed(seed))
    out = []
    for _ in range(count):
        s = lcg(s)
        b26 = s >> 22
        s = lcg(s)
        b27 = s >> 21
        out.append((b26 * (1 << 27) + b27) / float(1 << 53))
    return out


# --------------------------------------------------------- Catalyst expressions
def _lcg_sql(s: str) -> str:
    """One overflow-free LCG step (both addends < 2^60; Java's silent
    64-bit wrap is not available under Spark ANSI arithmetic)."""
    return (
        f"((({s}) & {MASK24}) * {MULT} + {ADD} + "
        f"(((shiftright({s}, 24) * {MULT_LO24}) & {MASK24}) * {MASK24 + 1})) "
        f"& {MASK48}"
    )


def _let(val: str, var: str, body: str) -> str:
    """One-element-lambda let binding: evaluate ``val`` once as ``var``."""
    return f"transform(array({val}), {var} -> {body})[0]"


def rand_integer_expr(seed: int, bound: int, pos_sql: str) -> str:
    """Scalar SQL reproducing ``RAND_INTEGER(seed, bound)`` for the row at
    1-based stream position ``pos_sql``. INT result, like the reference."""
    if bound <= 0:
        raise ValueError(f"RAND_INTEGER bound must be positive: {bound}")
    s0 = scramble(seed)
    if bound & (bound - 1) == 0:
        # power-of-two: (bound * next(31)) >> 31, never rejects — one
        # LCG step per draw, fold exactly pos steps
        step = _let(
            _lcg_sql("acc.s"), "s1",
            f"named_struct('s', s1, "
            f"'v', CAST(shiftright({bound} * shiftright(s1, 17), 31) AS INT))",
        )
        return (
            f"aggregate(sequence(1, {pos_sql}), "
            f"named_struct('s', CAST({s0} AS BIGINT), 'v', 0), "
            f"(acc, z) -> {step}, acc -> acc.v)"
        )
    # General bound: the filtered-stream fold — advance one RAW next(31)
    # per lambda step, APPEND accepted draws (rejected draws advance the
    # state only), and pick the pos-th accepted draw outside the lambda
    # (``pos_sql`` may be a window expression, which Spark forbids
    # inside lambda bodies). Exactly java.util.Random for any number of
    # rejections within the raw-step budget 2*pos + 64 — the SAME
    # budget the DuckDB oracle uses, so both engines share semantics to
    # the last bit. Cost: O(pos²) per row from the array builds — this
    # operator is pinned to conformance-sized relations (module note).
    pick = (
        f"CASE WHEN (b1 - (b1 % {bound}) + {bound - 1}) <= {INT_MAX} "
        f"THEN named_struct('s', s1, "
        f"'vs', array_append(acc.vs, CAST(b1 % {bound} AS INT))) "
        f"ELSE named_struct('s', s1, 'vs', acc.vs) END"
    )
    step = _let(_lcg_sql("acc.s"), "s1", _let("shiftright(s1, 17)", "b1", pick))
    return (
        f"element_at(aggregate(sequence(1, 2 * ({pos_sql}) + 64), "
        f"named_struct('s', CAST({s0} AS BIGINT), "
        f"'vs', CAST(array() AS ARRAY<INT>)), "
        f"(acc, z) -> {step}, acc -> acc.vs), CAST({pos_sql} AS INT))"
    )


def rand_seed_expr(seed: int, pos_sql: str) -> str:
    """Scalar SQL reproducing ``RAND(seed)`` (a DOUBLE in [0,1)) for the
    row at 1-based stream position ``pos_sql``."""
    s0 = scramble(mix_rand_seed(seed))
    step = _let(
        _lcg_sql("acc.s"), "s1",
        _let(_lcg_sql("s1"), "s2",
             f"named_struct('s', s2, 'v', "
             f"CAST(shiftright(s1, 22) * {1 << 27} + shiftright(s2, 21) AS DOUBLE)"
             f" / CAST({1 << 53} AS DOUBLE))"),
    )
    return (
        f"aggregate(sequence(1, {pos_sql}), "
        f"named_struct('s', CAST({s0} AS BIGINT), 'v', CAST(0 AS DOUBLE)), "
        f"(acc, z) -> {step}, acc -> acc.v)"
    )


# ------------------------------------------------------------------ DuckDB CTE
def _duck_lcg(expr: str) -> str:
    """The overflow-free LCG step over an arbitrary DuckDB expression."""
    return (
        f"((({expr}) & {MASK24}) * {MULT} + {ADD} + "
        f"((((({expr}) >> 24) * {MULT_LO24}) & {MASK24}) * {MASK24 + 1})) "
        f"& {MASK48}"
    )


def duck_rand_cte(name: str, seed: int, count: int, *,
                  bound: int | None = None, premixed_seed: int | None = None) -> str:
    """A ``WITH RECURSIVE``-body fragment producing ``name(pos, v)`` — the
    first ``count`` draws of the stream, 1-based.

    The integer form uses the filtered-stream formulation: the CTE
    advances one raw next(31) per row and FILTERS rejected draws
    afterwards, so rejection handling is unbounded (exactly
    java.util.Random), unlike the Spark expression's three-try unroll —
    an intentional asymmetry: the stricter oracle would surface a
    three-rejection divergence rather than reproduce it. The raw-step
    budget ``2*count + 64`` leaves room for ~64 rejections
    (P(rejection) ≤ (bound-1)/2^31 per draw; exhausting the budget
    would show up as missing oracle rows, loudly)."""
    if (bound is None) == (premixed_seed is None):
        raise ValueError("exactly one of bound / premixed_seed required")
    if bound is not None:
        s0 = scramble(seed)
        if bound & (bound - 1) == 0:
            # power-of-two: (bound * next(31)) >> 31, one draw per row,
            # never rejects (java.util.Random.nextInt's fast path)
            return f"""
  {name}_raw(step, s) AS (
    SELECT 0, CAST({s0} AS BIGINT) UNION ALL
    SELECT step + 1, {_duck_lcg('s')} FROM {name}_raw WHERE step < {count}
  ),
  {name} AS (
    SELECT step AS pos, CAST(({bound} * (s >> 17)) >> 31 AS INT) AS v
    FROM {name}_raw WHERE step > 0
  )"""
        steps = 2 * count + 64
        return f"""
  {name}_raw(step, s) AS (
    SELECT 0, CAST({s0} AS BIGINT) UNION ALL
    SELECT step + 1, {_duck_lcg('s')} FROM {name}_raw WHERE step < {steps}
  ),
  {name} AS (
    SELECT row_number() OVER (ORDER BY step) AS pos,
           CAST((s >> 17) % {bound} AS INT) AS v
    FROM {name}_raw
    WHERE step > 0
      AND ((s >> 17) - ((s >> 17) % {bound}) + {bound - 1}) <= {INT_MAX}
  )"""
    s0 = scramble(premixed_seed)
    # one CTE row per nextDouble = TWO lcg steps; s2 carries the state
    return f"""
  {name}_raw(i, s1, s2) AS (
    SELECT 0, CAST(0 AS BIGINT), CAST({s0} AS BIGINT) UNION ALL
    SELECT i + 1, {_duck_lcg('s2')}, {_duck_lcg(_duck_lcg('s2'))}
    FROM {name}_raw WHERE i < {count}
  ),
  {name} AS (
    SELECT i AS pos,
           CAST((s1 >> 22) * {1 << 27} + (s2 >> 21) AS DOUBLE)
             / CAST({1 << 53} AS DOUBLE) AS v
    FROM {name}_raw WHERE i > 0
  )"""
