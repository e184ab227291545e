"""Snapshot — temporal ``FOR SYSTEM_TIME AS OF`` over validity-interval
(SCD-2 style) tables.

Reference parity: rel/core/Snapshot.java:47 + schema/TemporalTable.java —
Calcite's Snapshot filters a temporal table to the version current at the
period specification. Without Delta Lake in this environment, the idiomatic
Spark form is a validity-interval filter: a row is visible at time T iff
``valid_from <= T < valid_to`` (NULL valid_to = current row).

The filter is a plain pushed-down predicate → partition/row-group pruning
works when the table is partitioned by validity date, which is how this
scales to append-only 100 TB dimension history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot(
    df: DataFrame,
    as_of: str | Column,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Rows current at ``as_of`` (timestamp literal string or Column)."""
    ts = F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
    return df.filter(
        (F.col(valid_from) <= ts)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > ts))
    )
