"""Queries exercising the custom operators (SURVEY.md §2.1 Match,
RepeatUnion, Snapshot; plus the as-of join from §7 phase 4.3).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drill_calcite_spark.operators import (
    asof_join, match_recognize, range_join, repeat_union, snapshot,
)
from drill_calcite_spark.queries.common import t, ts

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


# -------------------------------------------------------------- recursive CTE
@q("recursive_numbers", """
WITH RECURSIVE r(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM r WHERE n < 100
)
SELECT CAST(n AS BIGINT) AS n FROM r
""")
def recursive_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE via repeat_union (rel/core/RepeatUnion.java:53)."""
    seed = spark.range(1, 2).select(F.col("id").alias("n"))
    return repeat_union(
        seed,
        lambda frontier: frontier.filter(F.col("n") < 100).select(
            (F.col("n") + 1).alias("n")
        ),
        distinct=True,
        iteration_limit=150,
    )


@q("recursive_nation_tree", """
WITH RECURSIVE d(key, depth) AS (
  SELECT 0, 0
  UNION ALL
  SELECT n.n_nationkey, d.depth + 1
  FROM nation n JOIN d ON CAST(floor(n.n_nationkey / 2) AS INT) = d.key
  WHERE n.n_nationkey > 0
)
SELECT CAST(key AS BIGINT) AS key, CAST(depth AS BIGINT) AS depth FROM d
""")
def recursive_nation_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over a synthetic hierarchy (parent = key/2) —
    semi-naive BFS, one distributed join per depth level."""
    nation = t(spark, sf_dir, "nation")
    edges = (
        nation.filter(F.col("n_nationkey") > 0)
        .select(
            F.col("n_nationkey").cast("bigint").alias("child"),
            F.floor(F.col("n_nationkey") / 2).cast("bigint").alias("parent"),
        )
    )
    seed = spark.createDataFrame([(0, 0)], "key bigint, depth bigint")

    def step(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(edges, frontier.key == edges.parent)
            .select(F.col("child").alias("key"), (F.col("depth") + 1).alias("depth"))
        )

    return repeat_union(seed, step, distinct=True, iteration_limit=20)


# ------------------------------------------------------------------ as-of join
@q("asof_last_purchase", """
SELECT e.event_id, p.event_id AS purchase_event_id
FROM events e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""")
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent purchase at or before it.
    Union-marker implementation: one shuffle, no range join."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_event_id"],
    )
    return joined.select(
        "event_id", F.col("purchase_event_id_asof").alias("purchase_event_id")
    )




_MATCH_VSHAPE_ORACLE = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS pv
  FROM events
), cls AS (
  SELECT *, CASE WHEN pv IS NULL THEN 'F'
                 WHEN value < pv THEN 'D'
                 WHEN value > pv THEN 'U' ELSE 'F' END AS dir
  FROM ordered
), isl AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id, dir
                                    ORDER BY rn) AS grp
  FROM cls
), islands AS (
  SELECT user_id, dir, grp, min(rn) AS srn, max(rn) AS ern
  FROM isl GROUP BY 1, 2, 3
), pairs AS (
  SELECT d.user_id, d.srn AS d_srn, d.ern AS d_ern, u.ern AS u_ern,
         row_number() OVER (PARTITION BY d.user_id
                            ORDER BY d.srn) AS pno
  FROM islands d JOIN islands u
    ON u.user_id = d.user_id AND u.srn = d.ern + 1
  WHERE d.dir = 'D' AND u.dir = 'U'
), walk AS (
  SELECT user_id, 0 AS pno, 0 AS d_srn, 0 AS d_ern, 0 AS u_ern,
         0 AS start_rn, FALSE AS emitted, 0 AS prev_end
  FROM (SELECT DISTINCT user_id FROM pairs) seeds
  UNION ALL
  SELECT p.user_id, p.pno, p.d_srn, p.d_ern, p.u_ern,
         greatest(p.d_srn - 1, w.prev_end + 1) AS start_rn,
         greatest(p.d_srn - 1, w.prev_end + 1) <= p.d_ern - 1 AS emitted,
         CASE WHEN greatest(p.d_srn - 1, w.prev_end + 1) <= p.d_ern - 1
              THEN p.u_ern ELSE w.prev_end END AS prev_end
  FROM walk w JOIN pairs p
    ON p.user_id = w.user_id AND p.pno = w.pno + 1
)
SELECT w.user_id,
       s.event_id AS start_event,
       b.value AS bottom_value,
       e.event_id AS end_event,
       CAST(w.u_ern - w.start_rn + 1 AS BIGINT) AS match_len
FROM walk w
JOIN cls s ON s.user_id = w.user_id AND s.rn = w.start_rn
JOIN cls b ON b.user_id = w.user_id AND b.rn = w.d_ern
JOIN cls e ON e.user_id = w.user_id AND e.rn = w.u_ern
WHERE w.emitted
"""


# ------------------------------------------------------------ match_recognize
@q("match_vshape", _MATCH_VSHAPE_ORACLE)
def match_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE (rel/core/Match.java:57): V-shape in per-user event
    values — STRT DOWN+ UP+, AFTER MATCH SKIP PAST LAST ROW. ORACLE-BACKED
    since late r10 (rows-only r4-r9): the catch-all STRT makes greedy +
    leftmost + SKIP PAST LAST ROW reduce to a SEQUENTIAL walk over
    (down-island, up-island) pairs — the match starts at
    max(island_start − 1, prev_match_end + 1), needs at least one DOWN row
    after the start, and consumes through the up island's end — and the
    oracle replays that walk with a RECURSIVE CTE carrying the skip state
    (the same per-row-recursion discipline as match_packing_capacity), so
    the NFA's greedy-skip chain itself is hash-checked."""
    ev = t(spark, sf_dir, "events")
    return match_recognize(
        ev.select("user_id", "event_id", "ts", "value"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern="STRT DOWN+ UP+",
        define={
            "STRT": lambda p: pd.Series(True, index=p.index),
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={
            "user_id": lambda p, m: int(p["user_id"].iloc[0]),
            "start_event": lambda p, m: int(p["event_id"].iloc[m["*"][0]]),
            "bottom_value": lambda p, m: float(p["value"].iloc[m["DOWN"][-1]]),
            "end_event": lambda p, m: int(p["event_id"].iloc[m["*"][-1]]),
            "match_len": lambda p, m: len(m["*"]),
        },
        output_schema=(
            "user_id long, start_event long, bottom_value double, "
            "end_event long, match_len long"
        ),
    )


@q("match_vshape_all_rows", """
WITH ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER w AS rn,
         lag(value)   OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cls AS (
  SELECT *, CASE WHEN pv IS NULL THEN 'F'
                 WHEN value < pv THEN 'D'
                 WHEN value > pv THEN 'U' ELSE 'F' END AS dir
  FROM ordered
),
isl AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
  FROM cls
),
islands AS (
  SELECT user_id, dir, grp, min(rn) AS srn, max(rn) AS ern
  FROM isl GROUP BY user_id, dir, grp
),
matches AS (
  SELECT d.user_id, d.srn AS d_srn, d.ern AS d_ern, u.ern AS u_ern
  FROM islands d JOIN islands u
    ON d.user_id = u.user_id AND u.srn = d.ern + 1
  WHERE d.dir = 'D' AND u.dir = 'U'
),
numbered AS (
  SELECT m.*, row_number() OVER (PARTITION BY user_id ORDER BY d_srn) AS match_no
  FROM matches m
)
SELECT c.user_id, c.event_id, c.value,
       CASE WHEN c.dir = 'D' THEN 'DOWN' ELSE 'UP' END AS classifier,
       m.match_no,
       bt.value AS bottom,
       (m.u_ern - m.d_srn + 1) AS vv_n
FROM numbered m
JOIN cls c  ON c.user_id = m.user_id AND c.rn BETWEEN m.d_srn AND m.u_ern
JOIN cls bt ON bt.user_id = m.user_id AND bt.rn = m.d_ern
""")
def match_vshape_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ... ALL ROWS PER MATCH with SUBSET
    (rel/core/Match.java:57-72: ``rowsPerMatch``/``subsets``): per-user
    V-shapes with pattern DOWN+ UP+, emitting every matched row with
    MATCH_NUMBER() and CLASSIFIER(), a FINAL bottom measure, and a SUBSET
    VV = (DOWN, UP) row count.

    Oracle-checkable by construction: without a catch-all start symbol,
    greedy + leftmost + SKIP PAST LAST ROW semantics reduce EXACTLY to
    "maximal strictly-down island immediately followed by the maximal
    strictly-up island" — a gaps-and-islands join the SQL oracle replays.
    This is the Match component's first hash-checked (not rows-only)
    correctness evidence."""
    ev = t(spark, sf_dir, "events")
    return match_recognize(
        ev.select("user_id", "event_id", "ts", "value"),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern="DOWN+ UP+",
        define={
            "DOWN": lambda p: p["value"] < p["value"].shift(1),
            "UP": lambda p: p["value"] > p["value"].shift(1),
        },
        measures={
            "bottom": lambda p, m: float(p["value"].iloc[m["DOWN"][-1]]),
            "vv_n": lambda p, m: len(m["VV"]),
        },
        output_schema=(
            "user_id long, event_id long, value double, classifier string, "
            "match_no long, bottom double, vv_n long"
        ),
        rows_per_match="all",
        subset={"VV": ["DOWN", "UP"]},
    )


@q("islands_increasing_runs", """
WITH marked AS (
  SELECT user_id, event_id, value,
         CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), grp AS (
  SELECT user_id, event_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT user_id, count(DISTINCT island) AS n_runs,
       max(run_len) AS max_run_len
FROM (SELECT user_id, island, count(*) AS run_len
      FROM grp GROUP BY user_id, island)
GROUP BY user_id
""")
def islands_increasing_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (maximal increasing runs) — the SQL-expressible
    relative of match_vshape, fully oracle-checked. NOTE: islands are keyed by
    event_id-ordered running sums, identical in both engines."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_id = (
        W.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    marked = ev.select(
        "user_id", "event_id", "value",
        F.when(F.col("value") > F.lag("value").over(w), 0).otherwise(1).alias("brk"),
    )
    grp = marked.select(
        "user_id", "event_id", F.sum("brk").over(w_id).alias("island")
    )
    runs = grp.groupBy("user_id", "island").agg(F.count("*").alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.countDistinct("island").alias("n_runs"),
        F.max("run_len").alias("max_run_len"),
    )


# -------------------------------------------------------------------- snapshot
@q("snapshot_orders_scd", """
WITH v AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders
)
SELECT o_custkey, o_orderkey
FROM v
WHERE valid_from <= TIMESTAMP '1998-06-01 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-06-01 00:00:00')
""")
def snapshot_orders_scd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR SYSTEM_TIME AS OF (rel/core/Snapshot.java:47) over an SCD-2 view
    derived from each customer's order sequence: which order was 'current'
    per customer on 1998-06-01."""
    ords = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scd = ords.select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    return snapshot(scd, "1998-06-01", valid_from="valid_from", valid_to="valid_to") \
        .select("o_custkey", "o_orderkey")


# ------------------------------------------------------------- range join
@q("range_join_attribution", """
SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       c.user_id AS user_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) AS delta_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""")
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL RANGE JOIN — click→purchase attribution: every purchase
    a user makes within one hour (inclusive) after each click. Calcite
    plans this as a theta join (equi key + time inequalities on the Join
    condition, rel/core/Join.java:58); the engine's scale path is the
    bucketed rewrite (operators/range_join.py): window-width time
    buckets join EQUI on (user_id, bucket) with a 2× probe-side fan-out
    and the inequality kept as a residual — a hot key's history spreads
    across time buckets instead of meeting itself quadratically. The
    oracle runs the plain theta form; the hash match proves the rewrite
    returns the identical row multiset (boundary rows included — all
    time arithmetic is exact BIGINT microseconds)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    j = range_join.bucketed_range_join(
        clicks, purchases, "user_id", "c_ts", "p_ts", 3_600_000_000)
    return j.select("click_id", "purchase_id", "user_id", "delta_us")


@q("bloom_prune_join", """
SELECT o_orderkey, o_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey IN (1, 2, 3) AND c_mktsegment = 'BUILDING'
""")
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER JOIN PRUNING (operators/bloom.py — the explicit
    runtime-semi-join-filter building block; Calcite plans the
    semi-join shape via SemiJoinRule, Drill's runtime generates bloom
    filters inside its hash join): a selective customer subset builds a
    one-row 8192-bit bloom; orders are pruned MAP-ONLY by k=3
    array_contains probes before the join's shuffle (the final join is
    hinted merge to model the at-scale case where the dim itself is too
    big to broadcast but its bloom is not). No false negatives, so the
    plain-SQL join oracle pins exact equality — every surviving false
    positive is eliminated by the real join, every true match survives
    the prune. Plan test pins the filter BELOW the join exchange."""
    from drill_calcite_spark.operators.bloom import bloom_build, bloom_prune

    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 2, 3) & (F.col("c_mktsegment") == "BUILDING"))
    orders = t(spark, sf_dir, "orders")
    bloom = bloom_build(cust, "c_custkey")
    pruned = bloom_prune(orders, bloom, "o_custkey")
    return (
        pruned.hint("merge")
        .join(cust, pruned["o_custkey"] == cust["c_custkey"])
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    )


# ------------------------------------------------- MATCH_RECOGNIZE as SQL text
_MR_SQL_TEXT = """
SELECT user_id, event_id, value, classifier, match_no, bottom, vv_n
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id
  ORDER BY ts, event_id
  MEASURES MATCH_NUMBER() AS match_no,
           CLASSIFIER()   AS classifier,
           LAST(DOWN.value) AS bottom,
           COUNT(VV.value)  AS vv_n
  ALL ROWS PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (DOWN+ UP+)
  SUBSET VV = (DOWN, UP)
  DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
         UP   AS UP.value > PREV(UP.value)
)
"""

# identical semantics to match_vshape_all_rows -> identical oracle text
_MR_SQL_ORACLE = ORACLES["match_vshape_all_rows"]


@q("sql_match_recognize", _MR_SQL_ORACLE)
def sql_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE through the SQL FRONT DOOR (sql_match.py — the
    round-9 closure of the last §3.1 parse-path gap): the user TYPES the
    reference's row-pattern SQL (SqlMatchRecognize; the TICKER-query
    form with MEASURES / ALL ROWS PER MATCH / AFTER MATCH / PATTERN /
    SUBSET / DEFINE with PREV navigation) and calcite_sql routes the
    clause onto the distributed operator
    (operators/match_recognize.py), splicing the result back into the
    outer projection via the normal dialect rewrite. Semantics are
    IDENTICAL to match_vshape_all_rows (the hand-built operator call),
    so this row reuses its gaps-and-islands DuckDB oracle verbatim —
    the driver hash proves SQL-text path ≡ Python path ≡ islands
    algebra, three independent spellings of one answer. DEFINE
    conditions compile to VECTORIZED pandas expressions (never
    row-at-a-time); the operator itself is applyInPandas per partition
    key — one shuffle, sequential only within a partition (the
    MATCH_RECOGNIZE contract)."""
    from drill_calcite_spark.catalog import register_tables
    from drill_calcite_spark.sql import calcite_sql

    register_tables(spark, sf_dir)
    return calcite_sql(spark, _MR_SQL_TEXT)


@q("match_packing_capacity", """
WITH RECURSIVE numbered AS (
  SELECT user_id, event_id, (event_id % 7 + 1) AS sz,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), packed AS (
  SELECT user_id, event_id, rn, sz,
         CAST(1 AS BIGINT) AS match_no, sz AS acc
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_id, n.rn, n.sz,
         CASE WHEN p.acc + n.sz <= 12 THEN p.match_no
              ELSE p.match_no + 1 END,
         CASE WHEN p.acc + n.sz <= 12 THEN p.acc + n.sz ELSE n.sz END
  FROM packed p JOIN numbered n
    ON n.user_id = p.user_id AND n.rn = p.rn + 1
)
SELECT user_id, event_id, CAST(match_no AS BIGINT) AS match_no,
       CASE WHEN acc = sz THEN 'A' ELSE 'B' END AS classifier
FROM packed
""")
def match_packing_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE with a RUNNING AGGREGATE in DEFINE (SQL:2016
    aggregates-in-DEFINE — the construct behind the reference's
    DISABLED match.iq:57-82 packing query; the engine's StatefulDef
    predicates close it): capacitated sequence packing. Per user,
    events are packed greedily into bins of capacity 12 where an
    event's size is (event_id % 7 + 1) — PATTERN (A B*) with
    ``B AS size(A) + SUM(size(B)) <= 12``, evaluated against the rows
    matched SO FAR inside the backtracking matcher. Greedy + SKIP PAST
    LAST ROW reduces exactly to first-fit sequential bin packing, which
    the ORACLE replays with an INDEPENDENT algorithm — a recursive-CTE
    running-capacity scan — so the driver hash cross-proves the
    stateful matcher against per-row recursion. (This is also the
    training-pipeline "pack sequences to a token budget" shape driven
    through the MR front, complementing pack_token_chunks' window
    formulation.)

    Scale: one applyInPandas exchange on user_id (the partition-by
    key), pattern state bounded per partition — identical distribution
    to every other MR query; the stateful predicate is O(match length)
    per candidate row."""
    from drill_calcite_spark.operators.match_recognize import StatefulDef

    ev = (t(spark, sf_dir, "events")
          .select("user_id", "event_id", "ts",
                  (F.col("event_id") % 7 + 1).alias("sz")))

    def pack_cond(pdf, j, m):
        a = m.get("A")
        if not a:
            return False
        tot = int(pdf["sz"].iloc[a[0]]) + sum(
            int(pdf["sz"].iloc[r]) for r in m["B"])
        return tot <= 12

    return match_recognize(
        ev, ["user_id"], ["ts", "event_id"],
        pattern="A B*",
        define={"B": StatefulDef(pack_cond)},
        measures={},
        output_schema=("user_id long, event_id long, match_no long, "
                       "classifier string"),
        after_match="skip_past_last_row",
        rows_per_match="all",
    )
