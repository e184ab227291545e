"""Driver battery for the SQL-callable spatial surface
(functions/geo_sqlfn.py — the ST_* family registered as Spark SQL
temporary functions over ESRI-JSON geometry text).

Reference parity: core/src/main/java/org/apache/calcite/runtime/
GeoFunctions.java as exercised end-to-end by
core/src/test/resources/sql/spatial.iq — 76 of that script's cases
replay verbatim in tests/iq/calcite_spatial.iq; this battery gives the
same surface a driver-oracle row over the engine's testdata.

Oracle determinism: points are built from INTEGRAL doubles
(floor(c_acctbal), c_custkey % 997) so the ESRI number writer emits
pure integer text both engines reproduce byte-identically, and the
distance column is the same IEEE sqrt/multiply sequence in both
engines (the established geo.py twin convention).

Scale: everything here is a map-only column expression over one scan —
SQL UDFs are macro-inlined by Catalyst, so the whole battery stays in
whole-stage codegen with no Python boundary and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from drill_calcite_spark.functions.geo_sqlfn import register_geo_sql
from drill_calcite_spark.queries.common import t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _ensure_registered(spark: SparkSession) -> None:
    if not spark.catalog.functionExists("ST_GeomFromText"):
        register_geo_sql(spark)


_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         cast(floor(c_acctbal) AS BIGINT) AS ix,
         c_custkey % 997 AS iy
  FROM customer
)
SELECT c_custkey,
  'POINT' AS gtype,
  cast(ix AS DOUBLE) AS px,
  cast(iy AS DOUBLE) AS py,
  '{"x":' || ix || ',"y":' || iy || '}' AS point_json,
  'POINT (' || ix || ' ' || iy || ')' AS point_wkt,
  sqrt((cast(ix AS DOUBLE) - 500.0) * (cast(ix AS DOUBLE) - 500.0)
     + (cast(iy AS DOUBLE) - 500.0) * (cast(iy AS DOUBLE) - 500.0))
    AS dist,
  sqrt((cast(ix AS DOUBLE) - 500.0) * (cast(ix AS DOUBLE) - 500.0)
     + (cast(iy AS DOUBLE) - 500.0) * (cast(iy AS DOUBLE) - 500.0))
    <= 2000.0 AS nearby,
  'POLYGON ((' || least(ix, 500) || ' ' || least(iy, 500)
    || ', ' || greatest(ix, 500) || ' ' || least(iy, 500)
    || ', ' || greatest(ix, 500) || ' ' || greatest(iy, 500)
    || ', ' || least(ix, 500) || ' ' || greatest(iy, 500)
    || ', ' || least(ix, 500) || ' ' || least(iy, 500) || '))' AS env_wkt
FROM pts
"""


@q("sql_spatial_surface", _ORACLE)
def sql_spatial_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ST_* SQL-UDF surface end-to-end: constructor, accessors,
    renderer, distance/DWithin, and the MakeLine→Envelope→AsText chain,
    one map-only pass over customer. The DuckDB twin recomputes every
    string and double from the same integral inputs, so the driver's
    value-hash proves the ESRI JSON/WKT writers and the planar distance
    byte-for-byte (GeoFunctions.java; spatial.iq:36-465)."""
    _ensure_registered(spark)
    t(spark, sf_dir, "customer").createOrReplaceTempView("gsql_customer")
    return spark.sql("""
      SELECT c_custkey,
             ST_GeometryType(g) AS gtype,
             ST_X(g) AS px,
             ST_Y(g) AS py,
             g AS point_json,
             ST_AsText(g) AS point_wkt,
             ST_Distance(g, ST_Point(500.0D, 500.0D)) AS dist,
             ST_DWithin(g, ST_Point(500.0D, 500.0D), 2000.0D) AS nearby,
             ST_AsText(ST_Envelope(ST_MakeLine(g, ST_Point(500.0D, 500.0D))))
               AS env_wkt
      FROM (SELECT c_custkey,
                   ST_Point(cast(floor(c_acctbal) AS DOUBLE),
                            cast(c_custkey % 997 AS DOUBLE)) AS g
            FROM gsql_customer)""")
