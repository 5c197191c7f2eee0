"""Spatial box/distance operator (operators/spatial.py — the contrib
SpatialStrategy analogue, src/contrib/Lucene.Net.Contrib.Spatial.NTS/
SpatialStrategy.cs MakeQuery/MakeDistanceValueSource; fixture style after
test-files/spatial/ bbox + distance queries)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.operators import spatial


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    a = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2)
         * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
    return 2 * r * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def pts(spark):
    rows = [(i,
             ((i * 7919) % 18000) / 100.0 - 90.0,
             ((i * 104729) % 36000) / 100.0 - 180.0)
            for i in range(500)]
    return spark.createDataFrame(
        rows, "doc_id long, lat double, lon double").cache()


def test_box_filter_matches_python(pts):
    got = {r["doc_id"] for r in
           spatial.box_filter(pts, "lat", "lon", -10, 30, 0, 60).collect()}
    want = {r["doc_id"] for r in pts.collect()
            if -10 <= r["lat"] <= 30 and 0 <= r["lon"] <= 60}
    assert got == want and got


def test_distance_topk_matches_python(pts):
    got = [(r["doc_id"], r["distance_km"]) for r in
           spatial.distance_topk(pts, "lat", "lon", 10.0, 20.0,
                                 radius_km=3000.0, k=10).collect()]
    ref = sorted(
        ((r["doc_id"], round(_hav(10.0, 20.0, r["lat"], r["lon"]), 6))
         for r in pts.collect()),
        key=lambda x: (x[1], x[0]))
    ref = [p for p in ref if p[1] <= 3000.0][:10]
    assert got == ref and len(got) == 10


def test_radius_prefilter_is_superset(pts):
    """The bbox prefilter must never drop a doc inside the radius —
    verified by comparing against the unfiltered variant."""
    a = spatial.distance_topk(pts, "lat", "lon", 80.0, 0.0,
                              radius_km=2500.0, k=50).collect()
    full = (pts.select(
        "doc_id",
        F.round(spatial.haversine_km(F.lit(80.0), F.lit(0.0),
                                     F.col("lat"), F.col("lon")), 6)
        .alias("distance_km"))
        .where(F.col("distance_km") <= 2500.0)
        .orderBy("distance_km", "doc_id").limit(50).collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in full]


POLY = [(41.3, -63.7), (28.9, 49.1), (-17.4, 55.3),
        (-33.8, -12.9), (-8.6, -71.2)]


def _quad_py(lat, lon, level):
    n = 1 << level
    xi = min(n - 1, math.floor((lon + 180.0) / 360.0 * n))
    yi = min(n - 1, math.floor((lat + 90.0) / 180.0 * n))
    out = []
    for i in range(level):
        s = level - 1 - i
        out.append(str(((xi >> s) & 1) + 2 * ((yi >> s) & 1)))
    return "".join(out)


def test_quad_cell_matches_python(pts):
    got = pts.select("doc_id", spatial.quad_cell(
        F.col("lat"), F.col("lon"), 8).alias("c")).collect()
    for r in got:
        row = [(x["lat"], x["lon"]) for x in pts.collect()
               if x["doc_id"] == r["doc_id"]][0]
        assert r["c"] == _quad_py(row[0], row[1], 8), r["doc_id"]


def test_cell_rect_roundtrip():
    """A point's cell rect must contain the point."""
    for lat, lon in [(0.0, 0.0), (89.99, 179.99), (-90.0, -180.0),
                     (12.34, -56.78)]:
        key = _quad_py(lat, lon, 10)
        lo, hi, wlo, whi = spatial._cell_rect(key)
        assert lo <= lat <= hi and wlo <= lon <= whi


def test_point_in_polygon_matches_python(pts):
    got = {r["doc_id"] for r in pts.where(spatial.point_in_polygon(
        F.col("lat"), F.col("lon"), POLY)).collect()}
    want = {r["doc_id"] for r in pts.collect()
            if spatial.point_in_polygon_py(r["lat"], r["lon"], POLY)}
    assert got == want and got


def test_quad_covering_is_superset(pts):
    """Cover-prefilter + exact verify == direct verify: the covering
    must never prune a cell holding an inside point (the
    RecursivePrefixTreeFilter contract)."""
    got = {r["doc_id"] for r in spatial.polygon_search(
        pts, "lat", "lon", POLY, k=1000).collect()}
    want = sorted(r["doc_id"] for r in pts.collect()
                  if spatial.point_in_polygon_py(r["lat"], r["lon"], POLY))
    assert got == set(want[:1000]) and got


def test_polygon_covering_structure():
    prefixes, leaves = spatial.quad_covering(POLY, 8)
    # a healthy mid-size polygon yields both whole-cell prefixes and
    # boundary leaves, and every leaf is at the detail level
    assert prefixes and leaves
    assert all(len(p) <= 8 for p in prefixes)
    assert all(len(v) == 8 for v in leaves)
    # no leaf is a descendant of an accepted prefix (no double count)
    assert not any(v.startswith(p) for v in leaves for p in prefixes)


def test_pole_center_prefilter(pts):
    """cos(lat)≈0 at the pole: the lon window must widen to the full
    range rather than divide by ~zero."""
    got = spatial.distance_topk(pts, "lat", "lon", 90.0, 0.0,
                                radius_km=2000.0, k=5).collect()
    ref = sorted(
        ((r["doc_id"], round(_hav(90.0, 0.0, r["lat"], r["lon"]), 6))
         for r in pts.collect()),
        key=lambda x: (x[1], x[0]))
    ref = [p for p in ref if p[1] <= 2000.0][:5]
    assert [tuple(r) for r in got] == ref
