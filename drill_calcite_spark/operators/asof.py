"""As-of join — for each left row, the most recent right row at or before
its timestamp (per key).

The reference has no dedicated as-of operator; it plans such queries as
correlated sub-queries / lateral joins (rel/core/Correlate.java:68) or via
Snapshot for temporal tables (rel/core/Snapshot.java:47). We provide the
operator directly because at training-data scale "enrich events with the
latest dimension state" is a core primitive.

Implementation — the union-marker trick, NO range/cross join:
tag right rows, union both sides, sort within (key, ts) and carry the last
right payload forward with a running ``last(..., ignorenulls)`` window.
Cost: one shuffle by key + one in-partition sort — same as a regular
sort-merge join, and immune to the quadratic blowup of the naive
``l.ts >= r.ts`` range join. Skew in the key column is the only hazard,
handled the same way as any windowed op (salt the key upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    right_payload: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys (ties: the right
    row sorts before the left row at equal timestamps, i.e. inclusive ≤,
    matching DuckDB's ASOF JOIN and pandas merge_asof defaults).

    Right payload columns appear suffixed (default ``_asof``); left rows with
    no prior right row get NULLs (LEFT ASOF JOIN semantics).
    """
    keys = list(on)
    payload = list(right_payload) if right_payload is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    clash = {f"{p}{suffix}" for p in payload + [right_ts]} & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output columns {sorted(clash)} collide with left columns; "
            "use a different suffix or rename"
        )
    # normalized event stream: key cols, ts, side marker, payload (+ left cols)
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(right.dtypes)[p]).alias(f"__p_{p}") for p in payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__p_ts"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols
          if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
        F.col(right_ts).alias("__p_ts"),
    ).select(*l_tag.columns)  # align column order
    unioned = l_tag.unionByName(r_tag)
    # right rows (side=0) sort before left rows at the same ts → inclusive ≤
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{p}{suffix}")
          for p in payload],
        F.last("__p_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[f"{p}{suffix}" for p in payload], f"{right_ts}{suffix}"
    )
