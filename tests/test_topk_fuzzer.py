"""Property-fuzzer lane for the two-stage bounded top-K (r12).

The exactness claim (operators/topk.py, the r11 fix for the
text_boilerplate_mask scale-killer): under a TOTAL order, the
slice-partial top-k feeding a k·P-bounded merge equals the plain
single-window top-k — for ANY distribution of rows over groups, any
physical slicing, and in particular under adversarial TIE pileups at
the cut (many rows sharing the primary sort key around rank k, where a
non-total order would make the slice ranking keep a different
k-subset). Hypothesis drives exactly those corpora: primary keys drawn
from a tiny domain so rank-k boundaries land inside large tie classes,
group sizes from singleton to hundreds, k around the tie boundaries,
and several repartitionings so slices cut through tie classes.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from drill_calcite_spark.operators.topk import bounded_group_topk

# (group, primary) pairs; the unique tiebreak id is assigned by index.
# primary from {0..3} forces massive tie classes: with ~100 rows in a
# group and 4 distinct primaries, every top-k cut lands mid-tie.
_corpora = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=3)),
    min_size=1, max_size=300)


@settings(max_examples=8, deadline=None)
@given(corpus=_corpora,
       k=st.integers(min_value=1, max_value=25),
       nparts=st.integers(min_value=2, max_value=7))
def test_two_stage_topk_equals_single_window(spark, corpus, k, nparts):
    rows = [(f"g{g}", p, f"id{i:05d}") for i, (g, p) in enumerate(corpus)]
    df = (spark.createDataFrame(rows, "g string, nd int, h string")
          .repartition(nparts, F.col("h")))
    order = [F.col("nd").desc(), F.col("h").asc()]

    got = sorted((r.g, r.nd, r.h) for r in
                 bounded_group_topk(df, ["g"], order, k).collect())

    w = Window.partitionBy("g").orderBy(*order)
    want = sorted((r.g, r.nd, r.h) for r in
                  df.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= k).drop("rk").collect())

    assert got == want, (
        f"two-stage top-{k} diverged from the single window "
        f"(nparts={nparts}, |corpus|={len(corpus)})")


def test_two_stage_topk_tie_pileup_at_cut(spark):
    """Deterministic worst case: one group, every row sharing the same
    primary key (one giant tie class), k smaller than any slice — the
    answer is decided entirely by the tiebreak, and every slice's
    local ranking disagrees with the global one except on the true
    top-k. Also pins that the candidate stage really bounds the merge
    input (≤ k·P rows reach stage 2)."""
    n, k, nparts = 500, 7, 5
    rows = [("g", 1, f"id{i:05d}") for i in range(n)]
    df = (spark.createDataFrame(rows, "g string, nd int, h string")
          .repartition(nparts, F.col("h")))
    order = [F.col("nd").desc(), F.col("h").asc()]
    got = sorted(r.h for r in
                 bounded_group_topk(df, ["g"], order, k).collect())
    assert got == [f"id{i:05d}" for i in range(k)]

    part = Window.partitionBy("g", "__pid").orderBy(*order)
    cand_n = (df.withColumn("__pid", F.spark_partition_id())
              .withColumn("__prk", F.row_number().over(part))
              .filter(F.col("__prk") <= k).count())
    assert cand_n <= k * nparts, "stage-1 candidate bound violated"


def test_topk_reserved_column_guard(spark):
    """Input columns named like the internal working columns must fail
    loud at the API boundary (same discipline as the grouped-sketch
    builders)."""
    import pytest

    df = spark.createDataFrame([("g", 1, "x")],
                               "g string, __pid int, h string")
    with pytest.raises(ValueError, match="__pid"):
        bounded_group_topk(df, ["g"], [F.col("h").asc()], 3)
