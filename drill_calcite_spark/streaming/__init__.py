from drill_calcite_spark.streaming.core import (
    NonMonotonicStreamError,
    hop,
    require_monotonic_groups,
    run_available_now,
    session,
    stream_table,
    tumble,
)

__all__ = [
    "stream_table", "run_available_now", "tumble", "hop", "session",
    "require_monotonic_groups", "NonMonotonicStreamError",
]
