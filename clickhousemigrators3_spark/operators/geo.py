"""Geo-function surface — parity for ClickHouse's geo family
(``greatCircleDistance``/``geoDistance``, box membership as the degenerate
``pointInPolygon``, nearest-point classification).

The fixtures carry no coordinates, so both engines derive deterministic
lat/lon from ``c_custkey`` with identical integer arithmetic — the point is
the function surface and the join shape, not the data. All math is built-in
trig (JVM expressions / DuckDB scalar functions); great-circle uses the
haversine form, numerically stable at small angles where the spherical law
of cosines cancels.

Scale: distance and box membership are pure per-row projections (no
shuffle); nearest-anchor is a cross join against a bounded literal anchor
set (broadcast by construction) + per-row least-element selection — the
same shape at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..registry import register

EARTH_RADIUS_M = 6_371_000.0

# five anchor points (id, lat, lon) — a bounded literal dimension
ANCHORS = [
    (1, 37.7749, -122.4194),
    (2, 40.7128, -74.0060),
    (3, 51.5074, -0.1278),
    (4, 1.3521, 103.8198),
    (5, -33.8688, 151.2093),
]

# deterministic synthetic coordinates from the key (same text in both engines)
_LAT = "(CAST(c_custkey * 37 % 1800 AS DOUBLE) / 10.0 - 90.0)"
_LON = "(CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0 - 180.0)"


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in metres, haversine form — identical text is
    valid in Spark SQL and DuckDB, so the twins share one expression."""
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


_DIST_TO_SF = _haversine_sql(_LAT, _LON, "37.7749", "-122.4194")

GEO_SURFACE_ORACLE = f"""
SELECT c_custkey,
       ROUND({_LAT}, 4) AS lat,
       ROUND({_LON}, 4) AS lon,
       ROUND({_DIST_TO_SF} / 1000.0, 3) AS dist_to_sf_km,
       CAST({_LAT} BETWEEN 30 AND 60 AND {_LON} BETWEEN -130 AND -60
            AS INTEGER) AS in_na_box
FROM customer
WHERE c_custkey <= 1000
ORDER BY c_custkey
"""


@register("geo_functions_surface", GEO_SURFACE_ORACLE)
def geo_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatCircleDistance + box membership as per-row projections — no
    shuffle, survives any scale by construction."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    return (
        c.select(
            "c_custkey",
            F.round(F.expr(_LAT), 4).alias("lat"),
            F.round(F.expr(_LON), 4).alias("lon"),
            F.round(F.expr(_DIST_TO_SF) / 1000.0, 3).alias("dist_to_sf_km"),
            F.expr(
                f"CAST({_LAT} BETWEEN 30 AND 60 "
                f"AND {_LON} BETWEEN -130 AND -60 AS INTEGER)"
            ).alias("in_na_box"),
        )
        .orderBy("c_custkey")
    )


_ANCHOR_VALUES = ", ".join(f"({i}, {lat}, {lon})" for i, lat, lon in ANCHORS)
_DIST_TO_ANCHOR = _haversine_sql(_LAT, _LON, "a.alat", "a.alon")

GEO_NEAREST_ORACLE = f"""
WITH a(anchor_id, alat, alon) AS (VALUES {_ANCHOR_VALUES}),
scored AS (
  SELECT c_custkey, a.anchor_id, {_DIST_TO_ANCHOR} AS d
  FROM customer, a
  WHERE c_custkey <= 1000)
SELECT c_custkey, anchor_id AS nearest_anchor, ROUND(d / 1000.0, 3) AS dist_km
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                   ORDER BY d, anchor_id) AS rn
      FROM scored)
WHERE rn = 1
ORDER BY c_custkey
"""


@register("geo_nearest_anchor", GEO_NEAREST_ORACLE)
def geo_nearest_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-anchor classification (the geo sharding / point-of-presence
    assignment pattern): cross join against a bounded literal anchor
    relation (broadcast), per-row arg-min via a keyed window. At 10^9 rows
    the plan is identical — the anchor side is constant-size."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    a = spark.createDataFrame(ANCHORS, "anchor_id int, alat double, alon double")
    scored = c.crossJoin(F.broadcast(a)).select(
        "c_custkey",
        "anchor_id",
        F.expr(
            _haversine_sql(_LAT, _LON, "alat", "alon")
        ).alias("d"),
    )
    w = Window.partitionBy("c_custkey").orderBy("d", "anchor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("anchor_id").alias("nearest_anchor"),
            F.round(F.col("d") / 1000.0, 3).alias("dist_km"),
        )
        .orderBy("c_custkey")
    )
