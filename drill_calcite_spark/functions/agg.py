"""Aggregate helpers without direct Spark built-ins.

SINGLE_VALUE (SqlStdOperatorTable.java:987) is the aggregate Calcite
wraps around a scalar sub-query it cannot prove single-row: it returns
the one input value, or errors at runtime when the group has more. Spark
plans its own scalar subqueries the same way but does not expose the
guard as a function — this builds it from assert_true + max.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def single_value(c: Column) -> Column:
    """Aggregate expression: the sole value of ``c`` in the group, or a
    runtime error if the group holds more than one row (Calcite's
    SINGLE_VALUE / Spark's own scalar-subquery guard semantics). The
    assert_true rides inside a when() so the value branch only evaluates
    after the cardinality check passes."""
    ok = F.assert_true(
        F.count(F.lit(1)) <= 1,
        F.lit("SINGLE_VALUE: more than one row in scalar sub-query group"),
    )
    return F.when(ok.isNull(), F.max(c))
