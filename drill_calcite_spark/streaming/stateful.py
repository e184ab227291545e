"""Custom stateful streaming operators over applyInPandasWithState —
the state-store capability the reference's streaming model lacks entirely
(SURVEY.md §2.5: "no watermarks, no late-data policy, no state store" —
Drill-side engines were expected to supply execution; Structured Streaming
is ours).

Pattern: per-key mutable state held by Spark's state store, updated from
Arrow batches of that key's rows, emitting the refreshed aggregate in
``update`` mode. At scale, state is partitioned by the group key across
executors and checkpointed; watermark+timeout bound its growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_event_counter(sdf: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event counter with explicit state: each trigger
    folds the new rows into (count, value_sum) state and emits the updated
    totals. Equivalent relational form is a streaming GROUP BY — this
    operator exists to carry state a plain aggregate cannot (e.g. decayed
    counters, ML feature state); the count output keeps it oracle-checkable.

    Output: (key, n_events) per state update.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return (
        sdf.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
