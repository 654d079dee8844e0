"""Geospatial gates: geohash cell encoding and the broadcast kNN join.

The reference ships no geo surface; these are EXT training-pipeline rows
(location-tagged corpora need spatial bucketing for dedup/sharding and
nearest-site joins for enrichment). Coordinates are FORMULA-DERIVED from
integer keys — `(key*a % m)/100.0 - offset` — so both engines build the
identical doubles and the oracles can rebuild the inputs exactly.

Float policy: the geohash is pure integer bit arithmetic after one
identical float quantization — bit-exact across engines. Haversine uses
trig (genuinely approximate; libm vs java.lang.Math can differ in the
last ulp), so distances are rounded to 4 dp BEFORE ranking and hashing,
per the base.py approximate-value policy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import load, query

# The synthetic coordinate formulas, spelled ONCE and reused verbatim in
# the SQL oracles (same ops -> same doubles on both engines). The CAST
# AS DOUBLE before the division is load-bearing: a bare `x / 100.0` in
# Spark SQL is DECIMAL division (the 100.0 literal parses as
# DECIMAL(4,1)), which ships Decimal objects through toPandas() — the
# agg_hhi driver-hash seam (round-9; caught by check_oracle's kind
# check before the driver saw it).
_PT_LAT = "CAST(c_custkey * 37 % 17999 AS DOUBLE) / 100.0 - 90.0"
_PT_LON = "CAST(c_custkey * 73 % 35999 AS DOUBLE) / 100.0 - 180.0"
_SITE_LAT = "CAST(n_nationkey * 700 % 17999 AS DOUBLE) / 100.0 - 90.0"
_SITE_LON = "CAST(n_nationkey * 1300 % 35999 AS DOUBLE) / 100.0 - 180.0"


def _geohash_oracle(precision: int = 6) -> str:
    """Replay of ``geohash_encode`` (operators/geo.py) in DuckDB SQL,
    generated term-by-term so the bit layout matches the Column builder
    exactly: quantize with the same float expression, interleave with
    shift/mask sums, index the base32 alphabet per 5-bit group."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    g_terms = []
    for i in range(lon_bits):
        g_terms.append(
            f"(((lon_idx >> {lon_bits - 1 - i}) % 2) << {total - 1 - 2 * i})"
        )
    for i in range(lat_bits):
        g_terms.append(
            f"(((lat_idx >> {lat_bits - 1 - i}) % 2) << {total - 2 - 2 * i})"
        )
    chars = " || ".join(
        "substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST((g >> {total - 5 * (k + 1)}) % 32 AS INT) + 1, 1)"
        for k in range(precision)
    )
    return f"""
WITH p AS (SELECT c_custkey,
        {_PT_LAT} AS lat, {_PT_LON} AS lon FROM customer),
q AS (SELECT c_custkey, lat, lon,
        least(CAST(floor((lon + 180.0) / 360.0 * {float(1 << lon_bits)})
                   AS BIGINT), {(1 << lon_bits) - 1}) AS lon_idx,
        least(CAST(floor((lat + 90.0) / 180.0 * {float(1 << lat_bits)})
                   AS BIGINT), {(1 << lat_bits) - 1}) AS lat_idx
      FROM p),
i AS (SELECT c_custkey, lat, lon,
        {" + ".join(g_terms)} AS g FROM q)
SELECT c_custkey, lat, lon, {chars} AS cell FROM i
"""


@query("geo_geohash", oracle=_geohash_oracle())
def geo_geohash(spark, sf_dir):
    """Geohash cell id per customer at precision 6 (~1.2 km cells) —
    `geohash_encode` (operators/geo.py): one Column expression of pure
    shift/mask arithmetic, fully inside whole-stage codegen, no UDF.
    The cell id is the partition key that turns spatial joins into
    equi-joins at 100 TB. Coordinates are formula-derived from
    c_custkey so the oracle rebuilds them bit-exactly; the oracle
    replays the same quantization + interleave term-by-term."""
    from ..operators.geo import geohash_encode

    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        F.expr(_PT_LAT).alias("lat"),
        F.expr(_PT_LON).alias("lon"),
    )
    return pts.select(
        "c_custkey", "lat", "lon",
        geohash_encode("lat", "lon", precision=6).alias("cell"),
    )


_HAV = (
    "round(12742.0 * asin(sqrt("
    " sin(radians(s.lat - p.lat) / 2) * sin(radians(s.lat - p.lat) / 2)"
    " + cos(radians(p.lat)) * cos(radians(s.lat))"
    " * sin(radians(s.lon - p.lon) / 2) * sin(radians(s.lon - p.lon) / 2)"
    ")), 4)"
)


@query("geo_knn_join", oracle=f"""
WITH p AS (SELECT c_custkey, {_PT_LAT} AS lat, {_PT_LON} AS lon
           FROM customer),
s AS (SELECT n_nationkey, {_SITE_LAT} AS lat, {_SITE_LON} AS lon
      FROM nation),
d AS (SELECT p.c_custkey, p.lat, p.lon, s.n_nationkey,
        {_HAV} AS dist_km
      FROM p CROSS JOIN s),
r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY dist_km, n_nationkey) AS rank
      FROM d)
SELECT c_custkey, lat, lon, rank, n_nationkey, dist_km
FROM r WHERE rank <= 2
""")
def geo_knn_join(spark, sf_dir):
    """2 nearest nation sites per customer — `geo_knn_join`
    (operators/geo.py): the 25-site table collapses to ONE broadcast
    array row; every point scores it with `transform` + `array_sort`
    + `slice`, so the point side shuffles ZERO rows (a windowed
    row_number over the crossed pairs would shuffle |points|x|sites|).
    Distances round to 4 dp before ranking (struct sort order =
    (dist, site key), the deterministic tie-break); the oracle ranks
    the crossed pairs with the same rounded expression."""
    from ..operators.geo import geo_knn_join as knn

    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    pts = cust.select(
        "c_custkey",
        F.expr(_PT_LAT).alias("lat"),
        F.expr(_PT_LON).alias("lon"),
    )
    sites = nation.select(
        "n_nationkey",
        F.expr(_SITE_LAT).alias("lat"),
        F.expr(_SITE_LON).alias("lon"),
    )
    return knn(pts, sites, k=2, point_key="c_custkey",
               site_key="n_nationkey", dp=4)


# Radius-join coordinates keep |lat| <= 80 (the operator's fixed-lon-grid
# domain contract): same formula family, tighter lat range.
_RPT_LAT = "CAST(c_custkey * 37 % 15999 AS DOUBLE) / 100.0 - 80.0"
_RPT_LON = "CAST(c_custkey * 73 % 35999 AS DOUBLE) / 100.0 - 180.0"

_HAV_AB = (
    "round(12742.0 * asin(sqrt("
    " sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)"
    " + cos(radians(a.lat)) * cos(radians(b.lat))"
    " * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)"
    ")), 4)"
)


@query("geo_radius_join", oracle=f"""
WITH p AS (SELECT c_custkey, {_RPT_LAT} AS lat, {_RPT_LON} AS lon
           FROM customer),
d AS (SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        {_HAV_AB} AS dist_km
      FROM p a JOIN p b ON a.c_custkey < b.c_custkey)
SELECT key_a, key_b, dist_km FROM d WHERE dist_km <= 200.0
""")
def geo_radius_join(spark, sf_dir):
    """All customer pairs within 200 km — `geo_radius_join`
    (operators/geo.py): grid-cell blocking (one side explodes to its
    3x3 neighbor cells, equi-join on the cell struct) turns the
    all-pairs predicate into a plain hash join whose shuffle key is
    the spatial cell — no cross product, no nested loop, ~9x
    amplification of one side only. Longitude cells form a ring, so
    antimeridian pairs are found (unit-pinned). The oracle is the
    brute-force quadratic truth (fine at oracle SF; the ENGINE plan
    is the one that must scale), with the identical 4-dp-rounded
    haversine predicate."""
    from ..operators.geo import geo_radius_join as radius

    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        F.expr(_RPT_LAT).alias("lat"),
        F.expr(_RPT_LON).alias("lon"),
    )
    return radius(pts, radius_km=200.0, key="c_custkey")


#: geofence polygon for the point-in-polygon gate: a concave L-shape in
#: (lon, lat), vertices at 3-dp off-grid offsets so no 2-dp formula
#: point ever lies exactly on an edge (raw double compares stay safe)
_FENCE = [
    (-150.003, -70.007), (150.007, -70.003), (150.003, 0.005),
    (0.009, 0.001), (0.001, 70.007), (-150.009, 70.003),
]


def _pip_oracle() -> str:
    terms = []
    n = len(_FENCE)
    for i in range(n):
        x1, y1 = _FENCE[i]
        x2, y2 = _FENCE[(i + 1) % n]
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1!r} > lat) != ({y2!r} > lat))"
            f" AND lon < ({x2 - x1!r}) * (lat - {y1!r}) / ({y2 - y1!r})"
            f" + {x1!r} THEN 1 ELSE 0 END)"
        )
    return f"""
WITH p AS (SELECT c_custkey,
        {_PT_LAT} AS lat, {_PT_LON} AS lon FROM customer)
SELECT c_custkey, lat, lon,
       ({" + ".join(terms)}) % 2 = 1 AS inside
FROM p
"""


@query("geo_point_in_polygon", oracle=_pip_oracle())
def geo_point_in_polygon(spark, sf_dir):
    """Geofence membership (`point_in_polygon`, operators/geo.py —
    Shimrat 1962 ray casting, even-odd rule): each formula-derived
    customer point tested against a concave L-shaped fence. The
    polygon compiles to one sum of per-edge crossing predicates —
    plan literals, pure codegen, zero shuffle, composable with a
    geohash-cell pre-filter at scale; horizontal edges drop at plan
    time (they cannot straddle the ray, and skipping them keeps the
    slope division ANSI-safe). The oracle replays every edge term
    verbatim."""
    from ..operators.geo import point_in_polygon

    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        F.expr(_PT_LAT).alias("lat"),
        F.expr(_PT_LON).alias("lon"),
    )
    return pts.select(
        "c_custkey", "lat", "lon",
        point_in_polygon("lon", "lat", _FENCE).alias("inside"),
    )


# trajectory fixture: event coordinates formula-derived from event_id
# (the _PT_* convention), entity = user_id, time order = (ts, event_id)
_TRAJ_LAT = "CAST(event_id * 41 % 17999 AS DOUBLE) / 100.0 - 90.0"
_TRAJ_LON = "CAST(event_id * 97 % 35999 AS DOUBLE) / 100.0 - 180.0"

_TRAJ_LEG = (
    "round(12742.0 * asin(sqrt("
    " sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)"
    " + cos(radians(plat)) * cos(radians(lat))"
    " * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)"
    ")), 4)"
)


@query("geo_trajectory_stats", oracle=f"""
WITH p AS (SELECT user_id, ts, event_id,
        {_TRAJ_LAT} AS lat, {_TRAJ_LON} AS lon
      FROM events),
l AS (SELECT user_id, ts, lat, lon,
        lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT user_id, ts, lat, lon,
        CASE WHEN plat IS NULL THEN NULL
             ELSE CAST({_TRAJ_LEG} AS DECIMAL(20,4)) END AS leg
      FROM l)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
  round(COALESCE(CAST(SUM(leg) AS DOUBLE), 0.0), 4) AS total_km,
  round(CAST(MAX(leg) AS DOUBLE), 4) AS max_leg_km,
  CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT)
    AS duration_s,
  MIN(lat) AS lat_min, MAX(lat) AS lat_max,
  MIN(lon) AS lon_min, MAX(lon) AS lon_max
FROM g GROUP BY user_id
""")
def geo_trajectory_stats(spark, sf_dir):
    """Per-entity trajectory rollup (`trajectory_stats`,
    operators/geo.py): each events user becomes a GPS track
    (formula-derived coordinates, time-ordered with the event_id
    tiebreak) rolled into path length, longest single hop (the
    GPS-glitch detector), elapsed seconds, and the bounding box.
    Legs snap to 4-dp decimal before the per-entity sum (trig is
    approximate; the sum must not be order-dependent), released km
    round at 4 dp — the module's haversine policy. One keyed window
    + one keyed aggregation."""
    from ..operators.geo import trajectory_stats

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        (F.col("event_id") * 41 % 17999).cast("double")
        .__truediv__(100.0).__sub__(90.0).alias("lat"),
        (F.col("event_id") * 97 % 35999).cast("double")
        .__truediv__(100.0).__sub__(180.0).alias("lon"))
    return trajectory_stats(
        ev, "user_id", "ts", "lat", "lon", order_tiebreak="event_id")


@query("geo_polygon_area", oracle="""
WITH d AS (SELECT c_custkey,
    2 + c_custkey * 7 % 99 AS w, 2 + c_custkey * 13 % 99 AS h
  FROM customer),
p AS (SELECT c_custkey, w, h,
    1 + c_custkey * 3 % (w - 1) AS w1,
    1 + c_custkey * 5 % (h - 1) AS h1
  FROM d),
s AS (SELECT c_custkey, w, h, w1, h1,
    CAST(((0) * (0) - (w) * (0)) + ((w) * (h1) - (w) * (0)) + ((w) * (h1) - (w1) * (h1)) + ((w1) * (h) - (w1) * (h1)) + ((w1) * (h) - (0) * (h)) + ((0) * (0) - (0) * (h)) AS DOUBLE) AS a2,
    CAST(((0) + (w)) * ((0) * (0) - (w) * (0)) + ((w) + (w)) * ((w) * (h1) - (w) * (0)) + ((w) + (w1)) * ((w) * (h1) - (w1) * (h1)) + ((w1) + (w1)) * ((w1) * (h) - (w1) * (h1)) + ((w1) + (0)) * ((w1) * (h) - (0) * (h)) + ((0) + (0)) * ((0) * (0) - (0) * (h)) AS DOUBLE) AS sx,
    CAST(((0) + (0)) * ((0) * (0) - (w) * (0)) + ((0) + (h1)) * ((w) * (h1) - (w) * (0)) + ((h1) + (h1)) * ((w) * (h1) - (w1) * (h1)) + ((h1) + (h)) * ((w1) * (h) - (w1) * (h1)) + ((h) + (h)) * ((w1) * (h) - (0) * (h)) + ((h) + (0)) * ((0) * (0) - (0) * (h)) AS DOUBLE) AS sy
  FROM p)
SELECT c_custkey, CAST(6 AS INT) AS n_vertices,
  round(abs(a2) / 2.0, 6) AS area,
  CAST(CASE WHEN a2 > 0 THEN 1 ELSE -1 END AS INT) AS winding,
  round(sx / (3.0 * a2), 6) AS centroid_x,
  round(sy / (3.0 * a2), 6) AS centroid_y
FROM s
""")
def geo_polygon_area(spark, sf_dir):
    """Shoelace area/centroid/winding (`polygon_area_centroid`,
    operators/geo.py; Gauss) over formula-derived L-shaped geofences
    (one per customer, CCW, integer vertices — every term exact):
    the geometry rollup beside geo_point_in_polygon. The oracle
    expands the wrapped cross-product sum closed-form over the six
    vertices; the unit test additionally pins the rectilinear
    closed-form area w*h - (w-w1)*(h-h1). Row-local fold, zero
    shuffle."""
    from ..operators.geo import polygon_area_centroid

    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    w = (F.lit(2) + k * 7 % 99).alias("w")
    h = (F.lit(2) + k * 13 % 99).alias("h")
    base = c.select("c_custkey", w, h).select(
        "c_custkey", "w", "h",
        (F.lit(1) + k * 3 % (F.col("w") - 1)).alias("w1"),
        (F.lit(1) + k * 5 % (F.col("h") - 1)).alias("h1"))
    zero = F.lit(0).cast("long")
    poly = base.select(
        "c_custkey",
        F.array(zero, F.col("w"), F.col("w"), F.col("w1"),
                F.col("w1"), zero).alias("xs"),
        F.array(zero, zero, F.col("h1"), F.col("h1"),
                F.col("h"), F.col("h")).alias("ys"))
    return polygon_area_centroid(poly, "xs", "ys").drop("xs", "ys")
