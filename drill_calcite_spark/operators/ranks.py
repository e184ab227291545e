"""Distributed global ranking / distribution functions — the scale-safe
replacement for unpartitioned windows.

Reference parity: NTILE / CUME_DIST / PERCENT_RANK / RANK over a global
ordering (SqlStdOperatorTable.java:945-981). Spark executes an
unpartitioned ``Window.orderBy`` by funneling EVERY row through one task —
fine at test scale, fatal at 10^9 rows. This operator computes the same
values with the classic distributed-ranking recipe:

1. ``repartitionByRange`` on the order key — Spark's RangePartitioner
   gives totally-ordered, equal-key-co-located partitions;
2. per-partition local ranks via a window PARTITIONED by the range id
   (parallel, no funnel);
3. per-partition row counts collected to the driver (bounded: one row per
   partition, i.e. hundreds of longs at any scale) → prefix-sum offsets
   broadcast back;
4. global_rank = local_rank + offset[partition]; NTILE/CUME_DIST/
   PERCENT_RANK are closed-form in (global_rank, n).

Ties on the order key are detected (one distinct-count pass over the
already-checkpointed input) and corrected to SQL semantics with per-key
min/max windows: RANK = min row_number within the tie group, CUME_DIST =
max row_number / n. The detection pass is itself a shuffle+aggregate over
the input — real cost at 10^9 rows — so callers that can GUARANTEE key
uniqueness (e.g. ranking by a primary key) should pass
``assume_unique=True`` to skip both the detection and the correction;
with ties present the correction adds one more shuffle keyed by the
order columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def distributed_distribution(
    df: DataFrame, order_cols: Sequence[str], *, ntile: int,
    num_partitions: int = 32, assume_unique: bool = False,
) -> DataFrame:
    """Append ``global_rank``, ``ntile_bucket``, ``cume_dist`` and
    ``percent_rank`` (over the total order ``order_cols``) without a
    single-partition exchange.

    ``assume_unique=True`` asserts the order key has no duplicates and
    skips the tie-detection distinct-count pass (a full shuffle+aggregate
    otherwise paid on every call). Results are silently wrong under that
    assertion if ties do exist — it is the caller's contract, like
    SQL UNIQUE."""
    oc = list(order_cols)
    d = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in oc])
        .withColumn("__pid", F.spark_partition_id())
    )
    # Cache so the partition-count pass and the rank pass see the same
    # range split (repartitionByRange samples; two executions could bin
    # boundary keys differently).
    d = d.localCheckpoint(eager=False)
    counts = {r["__pid"]: r["cnt"] for r in
              d.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n = sum(counts.values())
    if n == 0:
        # empty input: stable schema, zero rows (an empty create_map()
        # would fail type resolution below)
        return (
            d.drop("__pid")
            .withColumn("global_rank", F.lit(None).cast("bigint"))
            .withColumn("ntile_bucket", F.lit(None).cast("int"))
            .withColumn("cume_dist", F.lit(None).cast("double"))
            .withColumn("percent_rank", F.lit(None).cast("double"))
        )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(counts) for x in (pid, offsets[pid])]
    )
    wl = W.partitionBy("__pid").orderBy(*oc)
    rn = (F.row_number().over(wl) + off_map[F.col("__pid")]).cast("bigint")
    d = d.withColumn("__rn", rn).drop("__pid")
    # Tie detection: distribution functions are rank-based, so duplicated
    # order keys make the row_number closed forms silently wrong. One
    # bounded agg pass (input is checkpointed above — no recompute),
    # skippable when the caller guarantees uniqueness.
    has_ties = (not assume_unique
                and d.select(*oc).distinct().count() < n)
    if has_ties:
        # SQL semantics under ties: RANK = min row_number in the tie
        # group; CUME_DIST numerator = max row_number (rows <= current).
        # partitionBy the order key: shuffles once, each tie group is
        # small, no single-task funnel.
        wk = W.partitionBy(*oc)
        g = F.min("__rn").over(wk).cast("bigint")
        cume_num = F.max("__rn").over(wk).cast("bigint")
    else:
        g = F.col("__rn")
        cume_num = F.col("__rn")
    # SQL NTILE: first (n mod k) buckets hold ceil(n/k) rows, the rest
    # floor(n/k) — closed form over the global ROW NUMBER (NTILE is
    # row-based, not rank-based, so ties don't affect it).
    k = ntile
    q, r = divmod(n, k)
    big = q + 1
    rnc = F.col("__rn")
    bucket = F.when(
        F.lit(r > 0) & (rnc <= big * r), F.floor((rnc - 1) / big) + 1
    ).otherwise(F.lit(r) + F.floor((rnc - big * r - 1) / F.lit(max(q, 1))) + 1)
    return (
        d.withColumn("global_rank", g)
        .withColumn("ntile_bucket", bucket.cast("int"))
        .withColumn("cume_dist", (cume_num / F.lit(n)).cast("double"))
        .withColumn(
            "percent_rank",
            (F.lit(0.0) if n == 1 else ((g - 1) / F.lit(n - 1))).cast("double"),
        )
        .drop("__rn")
    )
