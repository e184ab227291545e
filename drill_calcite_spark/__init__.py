"""drill_calcite_spark — a PySpark-native analytics engine with the query
surface of Apache Calcite 1.21 (drill fork, reference: vvysotskyi/drill-calcite).

Architecture (SURVEY.md §0): Calcite's role-map onto Spark is nearly 1:1 —
SqlParser→Spark SQL parser, SqlValidator→Catalyst Analyzer, RelNode→LogicalPlan,
VolcanoPlanner→Catalyst, Enumerable codegen→WholeStageCodegen. This package is
therefore a *surface* layer: session/catalog management, a RelBuilder-style
Python builder, a Calcite-semantics function catalog, and custom executors only
for the operators Spark genuinely lacks (MATCH_RECOGNIZE, recursive CTE,
as-of join) plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).
"""

from drill_calcite_spark.session import get_spark, stop_spark
from drill_calcite_spark.catalog import register_tables, load_tables, TABLES
from drill_calcite_spark.plans.builder import Rel
from drill_calcite_spark.sql import calcite_sql
from drill_calcite_spark.functions.geo_sqlfn import register_geo_sql

__all__ = [
    "get_spark",
    "stop_spark",
    "register_tables",
    "load_tables",
    "TABLES",
    "Rel",
    "calcite_sql",
    "register_geo_sql",
]

__version__ = "0.1.0"
