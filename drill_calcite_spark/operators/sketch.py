"""Count-min sketch: fixed-memory frequency estimation over unbounded
key cardinality — the "novel sketch" operator class the reference's
runtime does not ship (its approximate story is APPROX_COUNT_DISTINCT,
SqlStdOperatorTable; frequency estimation has no Calcite counterpart).

Cormode & Muthukrishnan 2005 (public): a d×w counter matrix; each key
increments one counter per row j at column ``h_j(key) mod w``; the
estimate is ``min_j C[j][h_j(key)]`` and NEVER underestimates — every
counter an item hashes to holds its true count plus non-negative
collision mass. With w = e/ε and d = ln(1/δ) the overestimate exceeds
εN with probability ≤ δ.

Cross-engine determinism: ``h_j(key)`` is the repo's standard md5
idiom — ``conv(substr(md5(j || ':' || key), 1, 15), 16, 10) % w``
(15 hex chars = 60 bits, fits BIGINT in both engines; the dedup.py
MinHash precedent) — so a DuckDB oracle reproduces the sketch cell for
cell and the driver hash can pin ESTIMATES, not just bounds.

Scale shape (the whole point of a sketch at 100 TB):

- Building the counters is ONE aggregation whose key space is capped at
  d×w cells regardless of corpus cardinality: the per-depth bucket ids
  explode map-side (d rows per input row, cheap column math), and
  partial aggregation collapses each task's stream to ≤ d×w partial
  cells BEFORE the exchange — the shuffle carries at most
  ``tasks × d × w`` tiny rows where a full groupBy(token) would carry
  the vocabulary.
- Sketches MERGE by cellwise addition (counters are linear), so
  per-partition / per-day sketches combine without re-reading data —
  :func:`cms_merge`, property-tested sketch(A∪B) = merge(sketch A,
  sketch B).
- Estimation touches only the candidate keys (explode × d, broadcast
  join against the 192-cell counter table, min per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 3
CMS_WIDTH = 64


def cms_bucket(key: Column, depth_j: Column | int) -> Column:
    """``h_j(key) mod w`` — deterministic, engine-portable."""
    j = F.lit(depth_j) if isinstance(depth_j, int) else depth_j
    salted = F.concat(j.cast("string"), F.lit(":"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10)
        .cast("bigint") % CMS_WIDTH
    )


def cms_sketch(df: DataFrame, key_col: str, weight_col: str | None = None,
               ) -> DataFrame:
    """Build the counter matrix: (j, bucket, cnt), ≤ CMS_DEPTH×CMS_WIDTH
    rows. ``weight_col`` (BIGINT) increments by weight; default 1."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = df.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
        w.cast("bigint").alias("w"),
    )
    return (
        cells.select("cell.j", "cell.bucket", "w")
        .groupBy("j", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise addition — sketches are linear, so sketch(A ∪ B) =
    merge(sketch(A), sketch(B)); absent cells count 0."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 ) -> DataFrame:
    """min_j C[j][h_j(key)] per candidate key. The sketch side is ≤
    d×w rows — always broadcast; a key hashing to an untouched cell
    estimates 0 (the left join's NULL → 0, matching an all-zero cell)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(CMS_DEPTH)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    cms_bucket(F.col(key_col), j).alias("bucket"),
                ),
            )
        ).alias("cell"),
    ).select(key_col, "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
