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

# Accumulated-union leaf budget: past this many materialized frontiers
# the union plan is compacted into one checkpointed RDD (see loop note).
ACC_COMPACT_LEAVES = 32


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
    leaves = 1
    for _ in range(iteration_limit):
        new = step(frontier)
        if distinct:
            new = new.distinct().join(acc, on=list(acc.columns), how="left_anti")
        # ONE action per round (r15): the lazy checkpoint is materialized
        # by the count() that decides convergence — the prior
        # eager-checkpoint-then-isEmpty form paid two scheduler
        # round-trips per round for the same decision (the graph.py
        # checkpoint discipline, r14).
        new = new.localCheckpoint(eager=False)
        if new.count() == 0:
            break
        # acc is a union of already-checkpointed frontiers: every leaf is
        # a materialized RDD, so no recompute is possible and the union
        # normally needs no checkpoint of its own. Re-checkpointing acc
        # EVERY round (the pre-r14 form) copied the ENTIRE accumulated
        # set per round — O(rounds × total) materialized bytes. But a
        # plan that only ever grows also isn't free: each DISTINCT-mode
        # round re-analyzes the anti-join over the k-leaf union, so deep
        # recursions (a 99-round chain) pay O(k) driver planning per
        # round — measured 0.29 → 0.65 s/round between rounds 10 and 90
        # at 1-row frontiers, pure driver cost. Compacting acc into one
        # materialized RDD every ACC_COMPACT_LEAVES rounds bounds the
        # plan at ≤33 leaves for O(total × rounds/32) re-materialized
        # bytes — strictly below the O(total)-per-round shuffle the
        # anti-join already pays, so the asymptotic round cost is
        # unchanged at scale while the driver stays O(1) per round.
        acc = acc.unionByName(new)
        leaves += 1
        if leaves > ACC_COMPACT_LEAVES:
            acc = acc.localCheckpoint(eager=False)
            leaves = 1
        frontier = new
    return acc
