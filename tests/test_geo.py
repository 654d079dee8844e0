"""Geo operators: geohash bit layout vs published test vectors, haversine
vs known city distances, the zero-shuffle kNN join, and its plan pin."""

import math

import pytest
from pyspark.sql import functions as F

from puffbird_spark import plans as P
from puffbird_spark.operators.geo import (
    geo_knn_join,
    geohash_encode,
    haversine_km,
)
from puffbird_spark.queries import QUERIES


def _encode(spark, lat, lon, precision):
    row = (
        spark.range(1)
        .select(
            geohash_encode(
                F.lit(float(lat)), F.lit(float(lon)), precision
            ).alias("g")
        )
        .first()
    )
    return row["g"]


def test_geohash_known_vectors(spark):
    # Published examples (Niemeyer geohash; wikipedia + geohash.org).
    assert _encode(spark, 57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert _encode(spark, 42.6, -5.6, 5) == "ezs42"
    assert _encode(spark, 0.0, 0.0, 1) == "s"
    assert _encode(spark, 48.8566, 2.3522, 6) == "u09tvw"


def test_geohash_edges_clamp_into_last_cell(spark):
    # Top-edge inputs must clamp, not overflow the bit budget.
    assert _encode(spark, 90.0, 180.0, 1) == "z"
    assert _encode(spark, -90.0, -180.0, 1) == "0"


def test_geohash_precision_validation(spark):
    with pytest.raises(ValueError):
        geohash_encode(F.lit(0.0), F.lit(0.0), precision=0)
    with pytest.raises(ValueError):
        geohash_encode(F.lit(0.0), F.lit(0.0), precision=13)


def test_geohash_prefix_property(spark):
    # A geohash at precision p is a prefix of the same point at p+1.
    g6 = _encode(spark, 57.64911, 10.40744, 6)
    g7 = _encode(spark, 57.64911, 10.40744, 7)
    assert g7.startswith(g6)


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278): ~343.5 km.
    d = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(48.8566), F.lit(2.3522),
                F.lit(51.5074), F.lit(-0.1278),
            ).alias("d")
        )
        .first()["d"]
    )
    assert math.isclose(d, 343.5, abs_tol=1.0)
    # Zero distance to self.
    z = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(48.8566), F.lit(2.3522),
                F.lit(48.8566), F.lit(2.3522),
            ).alias("d")
        )
        .first()["d"]
    )
    assert z == 0.0


def test_knn_join_hand_case(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 10.0)], "point_id int, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [(100, 0.0, 1.0), (200, 0.0, 2.0), (300, 50.0, 50.0)],
        "site_id int, lat double, lon double",
    )
    out = geo_knn_join(pts, sites, k=2).orderBy("point_id", "rank").collect()
    assert [(r["point_id"], r["rank"], r["site_id"]) for r in out] == [
        (1, 1, 100), (1, 2, 200), (2, 1, 200), (2, 2, 100),
    ]
    # 1 degree of longitude at the equator ~111.2 km.
    assert math.isclose(out[0]["dist_km"], 111.19, abs_tol=0.1)


def test_knn_join_tie_breaks_on_site_key(spark):
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "point_id int, lat double, lon double")
    sites = spark.createDataFrame(
        [(200, 0.0, 1.0), (100, 0.0, -1.0)],  # equidistant
        "site_id int, lat double, lon double",
    )
    out = geo_knn_join(pts, sites, k=2).orderBy("rank").collect()
    assert [r["site_id"] for r in out] == [100, 200]


def test_knn_join_k_exceeding_sites_and_validation(spark):
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "point_id int, lat double, lon double")
    sites = spark.createDataFrame(
        [(100, 1.0, 1.0)], "site_id int, lat double, lon double"
    )
    assert geo_knn_join(pts, sites, k=5).count() == 1
    with pytest.raises(ValueError):
        geo_knn_join(pts, sites, k=0)


def test_knn_join_point_side_never_shuffles(spark, sf_dir):
    """Plan pin: the only Exchange is the site table's single-partition
    collect_list — the point side crosses a broadcast 1-row array and
    sorts per-row. No SortMergeJoin, no window shuffle, no Python."""
    df = QUERIES["geo_knn_join"](spark, sf_dir)
    plan = P.formatted_plan(df)
    assert P.count_exchanges(df) == 1
    assert "SinglePartition" in plan
    assert not P.has_sort_merge_join(df)
    assert "Window" not in plan
    assert "Python" not in plan
    assert P.count_broadcast_joins(df) == 1


def test_geohash_gate_is_pure_codegen(spark, sf_dir):
    """Plan pin: geohash encoding is projection-only — zero Exchange,
    zero Python workers."""
    df = QUERIES["geo_geohash"](spark, sf_dir)
    assert P.count_exchanges(df) == 0
    assert "Python" not in P.formatted_plan(df)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id int, lat double, lon double")


def test_radius_join_hand_case(spark):
    from puffbird_spark.operators.geo import geo_radius_join

    pts = _pts(spark, [
        (1, 0.0, 0.0), (2, 0.5, 0.5),      # ~78.6 km apart -> pair
        (3, 40.0, 40.0),                    # isolated
        (4, 0.0, 1.5),                      # ~166.8 km from 1 -> pair; ~124 from 2
    ])
    out = geo_radius_join(pts, radius_km=200.0).orderBy("key_a", "key_b")
    got = [(r["key_a"], r["key_b"]) for r in out.collect()]
    assert got == [(1, 2), (1, 4), (2, 4)]


def test_radius_join_finds_antimeridian_pair(spark):
    from puffbird_spark.operators.geo import geo_radius_join

    # 179.9E and 179.9W at the equator are ~22.2 km apart across the seam.
    pts = _pts(spark, [(1, 0.0, 179.9), (2, 0.0, -179.9)])
    out = geo_radius_join(pts, radius_km=50.0).collect()
    assert [(r["key_a"], r["key_b"]) for r in out] == [(1, 2)]
    assert abs(out[0]["dist_km"] - 22.24) < 0.1


def test_radius_join_emits_each_pair_once_on_cell_boundary(spark):
    from puffbird_spark.operators.geo import geo_radius_join

    # Points in adjacent cells (and same cell) must appear exactly once.
    pts = _pts(spark, [(i, 0.0, i * 0.9) for i in range(1, 5)])
    out = geo_radius_join(pts, radius_km=110.0)
    pairs = [(r["key_a"], r["key_b"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {(1, 2), (2, 3), (3, 4)}


def test_radius_join_validation(spark):
    from puffbird_spark.operators.geo import geo_radius_join

    pts = _pts(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError):
        geo_radius_join(pts, radius_km=0.0)
    with pytest.raises(ValueError):
        geo_radius_join(pts, radius_km=10.0, lat_max=90.0)


def test_radius_join_plan_is_hash_join(spark, sf_dir):
    """Plan pin: the blocked self-join is a shuffle HASH join on the
    cell struct — no cross/nested-loop anywhere, no Python."""
    df = QUERIES["geo_radius_join"](spark, sf_dir)
    plan = P.formatted_plan(df)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_point_in_polygon_degenerate_and_null_probes(spark):
    """r11 adversarial geo probe: NULL coordinates must return NULL
    (the F.when otherwise-0 previously classified unknown locations as
    "outside"); zero-area collinear polygons contain nothing (points
    ON the line included, under the strict x < xint rule);
    self-intersecting bowties follow the even-odd rule; duplicate
    consecutive vertices are harmless (zero-length edges drop)."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.geo import point_in_polygon

    pts = spark.createDataFrame(
        [(0, 0.5, 0.5), (1, None, 0.5), (2, 0.5, None),
         (3, -1.0, 0.5), (4, 0.0, 0.5)],
        "id int, lon double, lat double")

    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    got = {r["id"]: r["r"] for r in pts.select(
        "id", point_in_polygon("lon", "lat", sq).alias("r")).collect()}
    assert got[0] is True
    assert got[1] is None and got[2] is None  # NULL in -> NULL out
    assert got[3] is False

    # zero-area vertical sliver: nothing inside, on-line point outside
    line = [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0)]
    lg = {r["id"]: r["r"] for r in pts.select(
        "id", point_in_polygon("lon", "lat", line).alias("r")).collect()}
    assert lg[0] is False and lg[3] is False and lg[4] is False
    assert lg[1] is None

    # bowtie (self-intersecting): even-odd keeps both lobes, excludes
    # the pinch point's vertical through-line by parity
    bow = [(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)]
    bpts = spark.createDataFrame(
        [(0, 0.5, 1.0), (1, 1.5, 1.0), (2, 1.0, 0.25), (3, 1.0, 1.75)],
        "id int, lon double, lat double")
    bg = {r["id"]: r["r"] for r in bpts.select(
        "id", point_in_polygon("lon", "lat", bow).alias("r")).collect()}
    assert bg[0] is True and bg[1] is True     # left/right lobes
    assert bg[2] is False and bg[3] is False   # above/below the pinch

    # duplicate consecutive vertices: same answers as the clean square
    dup = [(0.0, 0.0), (1.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    dg = {r["id"]: r["r"] for r in pts.select(
        "id", point_in_polygon("lon", "lat", dup).alias("r")).collect()}
    assert dg == got


def test_geohash_domain_edges_and_null(spark):
    """Probe batch 5: geohash must clamp BOTH domain edges (below-range
    garbage previously produced a negative quantized index whose
    sign-preserving %2 bits drove element_at to index 0 — an ANSI
    runtime error killing the whole job on one bad row) and must
    propagate NULL coordinates (least/greatest skip NULLs, so a NULL
    lat silently encoded as a fabricated top-cell location)."""
    from puffbird_spark.operators.geo import geohash_encode

    pts = spark.createDataFrame(
        [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0),
         (91.0, 181.0), (-91.0, -181.0),
         (None, 10.0), (10.0, None)],
        "lat double, lon double")
    got = [r["gh"] for r in pts.select(
        geohash_encode("lat", "lon", 6).alias("gh")).collect()]
    assert got[0] == "zzzzzz" and got[1] == "000000"
    assert got[2] == "s00000"
    # out-of-range clamps into the corner cells, never an error
    assert got[3] == "zzzzzz" and got[4] == "000000"
    # NULL in -> NULL out, never a fabricated location
    assert got[5] is None and got[6] is None


def test_trajectory_stats_hand_case(spark):
    """Two equator hops with known haversine legs roll up to the
    right totals, the longest hop lands in max_leg_km (the
    GPS-glitch detector), and a single-point entity reads 0 total /
    NULL max leg / 0 duration."""
    import datetime
    import math

    from puffbird_spark.operators.geo import trajectory_stats

    def ts(minutes):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            minutes=minutes)

    rows = [("a", ts(0), 1, 0.0, 0.0), ("a", ts(10), 2, 0.0, 1.0),
            ("a", ts(25), 3, 0.0, 3.0),       # 2-degree glitch hop
            ("b", ts(5), 4, 10.0, 20.0)]
    df = spark.createDataFrame(
        rows, "e string, ts timestamp, k int, lat double, lon double")
    out = {r["e"]: r for r in trajectory_stats(
        df, "e", "ts", "lat", "lon", order_tiebreak="k").collect()}

    def hav(lon_deg):
        return 12742.0 * math.asin(
            abs(math.sin(math.radians(lon_deg) / 2)))

    leg1 = math.floor(hav(1.0) * 1e4 + 0.5) / 1e4
    leg2 = math.floor(hav(2.0) * 1e4 + 0.5) / 1e4
    a = out["a"]
    assert a["n_points"] == 3
    assert a["total_km"] == round(leg1 + leg2, 4)
    assert a["max_leg_km"] == leg2
    assert a["duration_s"] == 25 * 60
    assert (a["lat_min"], a["lat_max"]) == (0.0, 0.0)
    assert (a["lon_min"], a["lon_max"]) == (0.0, 3.0)
    b = out["b"]
    assert b["n_points"] == 1 and b["total_km"] == 0.0
    assert b["max_leg_km"] is None and b["duration_s"] == 0


def test_polygon_area_centroid_hand_cases(spark):
    """Shoelace pins: the unit square (CCW) has area 1, centroid
    (0.5, 0.5), winding +1; the same ring reversed flips winding but
    not area/centroid; the L-shape matches its rectilinear closed
    form; a 2-vertex 'ring' and a zero-area degenerate line read
    NULL, never a divide-by-zero."""
    from puffbird_spark.operators.geo import polygon_area_centroid

    sq = [0, 1, 1, 0], [0, 0, 1, 1]
    rows = [
        ("sq", sq[0], sq[1]),
        ("sq_cw", list(reversed(sq[0])), list(reversed(sq[1]))),
        # L: w=4, h=3, w1=1, h1=1 -> area = 4*3 - (4-1)*(3-1) = 6
        ("ell", [0, 4, 4, 1, 1, 0], [0, 0, 1, 1, 3, 3]),
        ("line", [0, 1], [0, 1]),
        ("flat", [0, 1, 2], [0, 0, 0]),
    ]
    df = spark.createDataFrame(
        rows, "id string, xs array<long>, ys array<long>")
    out = {r["id"]: r for r in
           polygon_area_centroid(df, "xs", "ys").collect()}
    assert out["sq"]["area"] == 1.0 and out["sq"]["winding"] == 1
    assert (out["sq"]["centroid_x"], out["sq"]["centroid_y"]) \
        == (0.5, 0.5)
    assert out["sq_cw"]["area"] == 1.0
    assert out["sq_cw"]["winding"] == -1
    assert (out["sq_cw"]["centroid_x"], out["sq_cw"]["centroid_y"]) \
        == (0.5, 0.5)
    assert out["ell"]["area"] == 6.0 and out["ell"]["winding"] == 1
    assert out["line"]["area"] is None
    assert out["line"]["centroid_x"] is None
    assert out["flat"]["area"] == 0.0      # 3 vertices, zero signed
    assert out["flat"]["winding"] is None  # ... so no orientation
    assert out["flat"]["centroid_x"] is None
