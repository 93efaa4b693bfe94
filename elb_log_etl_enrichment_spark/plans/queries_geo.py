"""Geospatial tier: the reference's enrichment already attaches
lat/lon per client IP (elb_logs.py:159-181 → sources/http_geo.py), so
the spatial operations a log-analytics user runs over those points
belong in the engine: grid-cell density aggregation and
nearest-anchor haversine assignment.

Registry queries derive DETERMINISTIC synthetic coordinates from
``events.user_id`` (pure integer arithmetic, identical on any engine)
— the testdata tables carry no geo columns, and hash-free integer
derivation keeps the oracle exact. In production the same expressions
run over the geo-cache join output.

Float determinism: haversine uses sin/cos/asin/sqrt; Spark (JVM) and
DuckDB (libm) agree to the last ulp on these in practice, and all
outputs round at 6 dp — same accepted class as the ln()-based
unigram/NB/PMI queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, register

#: synthetic-but-deterministic point per user (integer-derived)
_LAT = "( (user_id % 17) * 10 - 80 + (user_id % 7) * 0.5 )"
_LON = "( ((user_id * 13) % 36) * 10 - 180 + (user_id % 11) * 0.3 )"

#: anchor "datacenters" (region label, lat, lon)
_ANCHORS = (
    ("us-east", 39.0, -77.5),
    ("eu-west", 53.3, -6.3),
    ("ap-south", 19.1, 72.9),
)

_EARTH_R_KM = 6371.0


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * {_EARTH_R_KM} * asin(sqrt("
        f"  sin(radians(({lat2}) - ({lat1})) / 2) ^ 2"
        f"  + cos(radians({lat1})) * cos(radians({lat2}))"
        f"    * sin(radians(({lon2}) - ({lon1})) / 2) ^ 2))"
    )


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km, pure JVM trig (no UDF)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = F.sin(dphi) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * (
        F.sin(dlmb) ** 2
    )
    return 2 * _EARTH_R_KM * F.asin(F.sqrt(a))


@register(
    "geo_cell_density",
    sql=f"""
    WITH pts AS (
        SELECT user_id, {_LAT} AS lat, {_LON} AS lon, value FROM events
    )
    SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
           CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(SUM(value), 6) AS total_value
    FROM pts
    GROUP BY 1, 2
    ORDER BY n_events DESC, cell_lat, cell_lon
    LIMIT 25
    """,
    tags=("geo", "spatial", "grid", "agg"),
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10°×10° grid cells by event volume. Grid binning is the
    scale-right spatial aggregation: cell ids are pure integer floors
    (shuffle key = 16 bytes), map-side combinable, and at 100 TB the
    cell id doubles as the partition key for spatial locality — the
    same role the IVF cell id plays for vectors."""
    e = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 17) * 10 - 80 + (F.col("user_id") % 7) * 0.5
    lon = ((F.col("user_id") * 13) % 36) * 10 - 180 + (F.col("user_id") % 11) * 0.3
    return (
        e.select("user_id", "value", lat.alias("lat"), lon.alias("lon"))
        .groupBy(
            F.floor(F.col("lat") / 10).cast("long").alias("cell_lat"),
            F.floor(F.col("lon") / 10).cast("long").alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "cell_lat", "cell_lon")
        .limit(25)
    )


@register(
    "nearest_dc_assignment",
    sql=f"""
    WITH pts AS (
        SELECT user_id, {_LAT} AS lat, {_LON} AS lon FROM events
    ),
    dists AS (
        SELECT user_id,
               {_haversine_sql("lat", "lon", str(_ANCHORS[0][1]), str(_ANCHORS[0][2]))} AS d0,
               {_haversine_sql("lat", "lon", str(_ANCHORS[1][1]), str(_ANCHORS[1][2]))} AS d1,
               {_haversine_sql("lat", "lon", str(_ANCHORS[2][1]), str(_ANCHORS[2][2]))} AS d2
        FROM pts
    ),
    assigned AS (
        SELECT user_id,
               CASE WHEN d0 <= d1 AND d0 <= d2 THEN '{_ANCHORS[0][0]}'
                    WHEN d1 <= d2 THEN '{_ANCHORS[1][0]}'
                    ELSE '{_ANCHORS[2][0]}' END AS dc,
               LEAST(d0, d1, d2) AS dist_km
        FROM dists
    )
    SELECT dc,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           ROUND(AVG(dist_km), 6) AS avg_km,
           ROUND(MAX(dist_km), 6) AS max_km
    FROM assigned
    GROUP BY dc
    ORDER BY dc
    """,
    tags=("geo", "spatial", "haversine", "agg"),
)
def nearest_dc_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-datacenter assignment by haversine distance — the
    latency-routing question over the reference's own lat/lon
    enrichment. The anchor set is a literal (3 rows), so per-event
    work is three JVM trig expressions and a CASE — no join, no UDF,
    no shuffle before the final per-DC aggregate; with N anchors the
    same shape broadcasts the anchor table and takes a min-by over the
    exploded distances."""
    e = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 17) * 10 - 80 + (F.col("user_id") % 7) * 0.5
    lon = ((F.col("user_id") * 13) % 36) * 10 - 180 + (F.col("user_id") % 11) * 0.3
    pts = e.select("user_id", lat.alias("lat"), lon.alias("lon"))
    d = pts
    for i, (_, alat, alon) in enumerate(_ANCHORS):
        d = d.withColumn(
            f"d{i}",
            haversine_km(F.col("lat"), F.col("lon"), F.lit(alat), F.lit(alon)),
        )
    dc = (
        F.when(
            (F.col("d0") <= F.col("d1")) & (F.col("d0") <= F.col("d2")),
            _ANCHORS[0][0],
        )
        .when(F.col("d1") <= F.col("d2"), _ANCHORS[1][0])
        .otherwise(_ANCHORS[2][0])
    )
    return (
        d.select(
            "user_id",
            dc.alias("dc"),
            F.least("d0", "d1", "d2").alias("dist_km"),
        )
        .groupBy("dc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.round(F.avg("dist_km"), 6).alias("avg_km"),
            F.round(F.max("dist_km"), 6).alias("max_km"),
        )
        .orderBy("dc")
    )


_HOTSPOT_MIN_EVENTS = 70


@register(
    "geo_hotspot_clusters",
    sql=f"""
    WITH RECURSIVE pts AS (
        SELECT {_LAT} AS lat, {_LON} AS lon FROM events
    ),
    cells AS (
        SELECT CAST(floor(lat / 10) AS BIGINT) AS cl,
               CAST(floor(lon / 10) AS BIGINT) AS cn,
               COUNT(*) AS c
        FROM pts GROUP BY 1, 2
        HAVING COUNT(*) >= {_HOTSPOT_MIN_EVENTS}
    ),
    ids AS (
        SELECT (cl + 90) * 1000 + (cn + 180) AS id, cl, cn, c FROM cells
    ),
    edges AS (
        SELECT a.id AS src, b.id AS dst
        FROM ids a JOIN ids b
          ON abs(a.cl - b.cl) <= 1 AND abs(a.cn - b.cn) <= 1
             AND a.id <> b.id
    ),
    reach(id, root) AS (
        SELECT id, id FROM ids
        UNION
        SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS hotspot FROM reach GROUP BY id)
    SELECT c2.hotspot AS hotspot_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(i.c) AS BIGINT) AS n_events
    FROM ids i JOIN comp c2 ON c2.id = i.id
    GROUP BY c2.hotspot
    ORDER BY n_events DESC, hotspot_id
    """,
    tags=("geo", "spatial", "dbscan", "graph", "connected_components"),
)
def geo_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN hotspots: dense 10° cells (≥70 events) merged with
    their 8-neighborhood via connected components — the spatial analog
    of the dedup-cluster pass, at CELL granularity. Scale shape: the
    corpus collapses to the bounded cell table (≤648 cells at 10°)
    before any graph work, so adjacency self-join, CC iterations, and
    the final rollup all run over dimension-sized frames regardless of
    event volume; only the one density aggregate touches the fact
    table."""
    from ..operators.graph import connected_components

    e = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 17) * 10 - 80 + (F.col("user_id") % 7) * 0.5
    lon = ((F.col("user_id") * 13) % 36) * 10 - 180 + (F.col("user_id") % 11) * 0.3
    cells = (
        e.select(
            F.floor(lat / 10).cast("long").alias("cl"),
            F.floor(lon / 10).cast("long").alias("cn"),
        )
        .groupBy("cl", "cn")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _HOTSPOT_MIN_EVENTS)
        .withColumn("id", (F.col("cl") + 90) * 1000 + (F.col("cn") + 180))
        .persist()  # bounded (≤648 rows): feeds edges, CC seed, rollup
    )
    a, b = cells.alias("a"), cells.alias("b")
    edges = a.join(
        b,
        (F.abs(F.col("a.cl") - F.col("b.cl")) <= 1)
        & (F.abs(F.col("a.cn") - F.col("b.cn")) <= 1)
        & (F.col("a.id") != F.col("b.id")),
    ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    labels = connected_components(
        cells.select("id"), edges, id_col="id", src_col="src", dst_col="dst"
    )
    return (
        cells.join(
            labels.select(F.col("id"), F.col("label").alias("hotspot_id")), "id"
        )
        .groupBy("hotspot_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("c").cast("long").alias("n_events"),
        )
        .orderBy(F.col("n_events").desc(), "hotspot_id")
    )
