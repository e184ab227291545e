"""RepeatUnion — recursive CTE (WITH RECURSIVE) execution.

Reference parity: rel/core/RepeatUnion.java:53 (seed ∪ iterative step until
fixpoint, with ``iterationLimit`` at :64) + Spool/TableSpool
(rel/core/Spool.java:37, TableSpool.java:35) which materialize each round.

Spark has no fixpoint operator, so the loop runs on the driver — but each
*round* is a fully distributed DataFrame job, and intermediate results are
localCheckpoint()-ed, which is exactly the Spool: it cuts the growing lineage
so round N doesn't re-execute rounds 1..N-1 (without it the plan doubles per
iteration and dies at ~20 rounds).

Scale notes: UNION ALL mode appends frontiers; DISTINCT mode anti-joins the
new frontier against the accumulated set each round, so per-round work is
O(frontier ⋈ acc) — the same incremental-closure strategy every serious
recursive-SQL engine uses. State lives in Spark storage, never on the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def repeat_union(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    *,
    distinct: bool = True,
    iteration_limit: int = 100,
) -> DataFrame:
    """Compute ``seed UNION [ALL] step(seed) UNION [ALL] step(step(seed)) …``
    until the step produces no new rows or ``iteration_limit`` is reached
    (mirrors RepeatUnion.iterationLimit, rel/core/RepeatUnion.java:64).

    ``step`` receives the *previous frontier* (delta), not the accumulated
    set — semi-naive evaluation.

    Hitting ``iteration_limit`` returns the rows accumulated so far, matching
    the reference's repeatUnionAll (linq4j EnumerableDefaults.java:3823),
    which stops at the limit rather than erroring. In DISTINCT mode the seed
    itself is deduplicated too, so duplicate seed rows can't survive into a
    supposedly distinct result.
    """
    if distinct:
        seed = seed.distinct()
    acc = seed.localCheckpoint(eager=True)
    frontier = acc
    for _ in range(iteration_limit):
        new = step(frontier)
        if distinct:
            new = new.distinct().join(acc, on=list(acc.columns), how="left_anti")
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        # acc is a union of already-checkpointed frontiers: every leaf is
        # a materialized RDD, so no recompute is possible and the union
        # needs no checkpoint of its own. Re-checkpointing acc here (the
        # pre-r14 form) copied the ENTIRE accumulated set every round —
        # O(rounds × total) materialized bytes instead of O(total); the
        # plan grows only linearly in rounds (bounded by
        # iteration_limit), which Catalyst handles fine.
        acc = acc.unionByName(new)
        frontier = new
    return acc
