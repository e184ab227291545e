"""Bucketed interval RANGE JOIN — the equi-join scale path for
``l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + W`` joins.

Calcite plans this shape as a theta join (a Join whose condition mixes
the equi key with the time inequalities — ``rel/core/Join.java:58``
accepts any condition; the Enumerable engine then nested-loops the
non-equi residual). Spark's SortMergeJoin does the same: the equi key
carries the shuffle and every same-key pair is tested against the time
predicate — quadratic in the per-key event count, which is exactly the
column that grows at 100 TB (a hot user/session/device key with 10⁶
events → 10¹² comparisons).

The bucketed form makes the TIME dimension part of the shuffle key:

- bucket width = the window length W, so a right row matches rows of at
  most TWO left buckets;
- the LEFT (probe) side duplicates each row into its own bucket and the
  next one (a bounded 2× fan-out, map-side);
- the RIGHT side computes its single home bucket;
- the join becomes an EQUI join on (key, bucket) with the original
  inequality kept as a cheap residual filter.

Per-pair semantics are identical to the theta join (each candidate pair
meets through exactly one bucket — the right row's home bucket — so no
dedup step is needed), but the shuffle now spreads a hot key across
time, and each joined partition only holds ~2 windows of data instead
of the key's whole history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Inner-join rows of ``right`` to rows of ``left`` sharing ``key``
    with ``right_ts`` in the inclusive interval
    ``[left_ts, left_ts + window_us]`` (microsecond precision — exact
    BIGINT arithmetic end to end, so the boundary rows are
    engine-deterministic).

    Returns the joined frame with all columns of both inputs plus
    ``delta_us`` (right minus left event time). Column names must not
    collide across the two inputs apart from ``key``.
    """
    w = F.lit(window_us)
    le = F.unix_micros(F.col(left_ts))
    re_ = F.unix_micros(F.col(right_ts))

    probes = left.withColumn("__e_l", le).withColumn(
        "__bucket",
        F.explode(F.array(
            F.call_function("div", F.col("__e_l"), w),
            F.call_function("div", F.col("__e_l"), w) + 1,
        )),
    )
    build = right.withColumn("__e_r", re_).withColumn(
        "__bucket", F.call_function("div", F.col("__e_r"), w))

    joined = probes.join(build, [key, "__bucket"]).filter(
        F.col("__e_r").between(F.col("__e_l"), F.col("__e_l") + w))
    return joined.withColumn(
        "delta_us", (F.col("__e_r") - F.col("__e_l")).cast("bigint")
    ).drop("__e_l", "__e_r", "__bucket")


def range_join_theta(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """The naive theta form (equi key + time residual on the join
    condition itself) — the oracle-anchor twin of
    :func:`bucketed_range_join`, kept for tests that prove the bucketed
    rewrite returns the identical row multiset."""
    r = right.withColumnRenamed(key, f"__r_{key}")
    cond = (
        (left[key] == r[f"__r_{key}"])
        & (F.unix_micros(r[right_ts]) >= F.unix_micros(left[left_ts]))
        & (F.unix_micros(r[right_ts])
           <= F.unix_micros(left[left_ts]) + F.lit(window_us))
    )
    joined = left.join(r, cond).drop(f"__r_{key}")
    return joined.withColumn(
        "delta_us",
        (F.unix_micros(F.col(right_ts))
         - F.unix_micros(F.col(left_ts))).cast("bigint"),
    )
