"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a (spark_query, oracle_sql) pair consumed by __spark_entry__.py.

Submodules group the inventory:
- tpch      — headline relational queries (scan/filter/project/agg/join/sort spine)
- relops    — per-operator coverage (§2.1: joins, set ops, windows, grouping sets, …)
- funcs     — scalar function batteries (§2.4)
- custom    — operators Spark lacks natively (§2.1 Match, RepeatUnion; as-of join)
- llm       — training-data-pipeline operators (dedup, similarity, text analysis)
- streaming — TUMBLE/HOP/SESSION + live Structured Streaming drains (§2.5)
- sources   — CSV/JSON schema-on-read scans + TableModify DML (§2.3)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from drill_calcite_spark.queries import custom, funcs, llm, relops, sources, streaming, tpch, tpch2

    out: dict[str, QueryFn] = {}
    for mod in (tpch, tpch2, relops, funcs, custom, llm, streaming, sources):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from drill_calcite_spark.queries import custom, funcs, llm, relops, sources, streaming, tpch, tpch2

    out: dict[str, str] = {}
    for mod in (tpch, tpch2, relops, funcs, custom, llm, streaming, sources):
        out.update(mod.ORACLES)
    return out
