"""Spatial box / distance search over stored lat-lon columns.

The reference ships spatial search as a contrib strategy over indexed
location fields (src/contrib/Lucene.Net.Contrib.Spatial.NTS/
SpatialStrategy.cs: MakeQuery builds a ConstantScoreQuery filter for a
shape, MakeDistanceValueSource orders by point-to-point distance; the
only external fixtures in the repo, test-files/spatial/, exercise
bounding-box + distance queries).  The Spark-first re-expression skips
the grid-tile indirection entirely: lat/lon live as ordinary stored
columns, a bounding box is a NATIVE column predicate (parquet min/max
pruning + pushdown for free — the analogue of the tile prefix filter),
and distance is one JVM haversine expression (whole-stage codegen, no
UDF).  Constant-score filter semantics: the shape never contributes to
relevance, exactly like the reference's ConstantScoreQuery wrap.

At 100 TB: the box predicate prunes row groups via parquet column
statistics before any row is read; distance ranking is a scan-local
expression + TakeOrderedAndProject — no shuffle beyond the final top-k.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius (public constant)


def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                 lon2: Column) -> Column:
    """Great-circle distance in km as a pure JVM column expression."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.pow(F.sin(dlat / 2), 2)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.pow(F.sin(dlon / 2), 2))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def box_filter(df: DataFrame, lat_col: str, lon_col: str,
               min_lat: float, max_lat: float,
               min_lon: float, max_lon: float) -> DataFrame:
    """Bounding-box filter — the SpatialStrategy.MakeQuery(bbox) analogue
    as native BETWEEN predicates (pushed to the scan)."""
    return df.where(
        F.col(lat_col).between(float(min_lat), float(max_lat))
        & F.col(lon_col).between(float(min_lon), float(max_lon)))


# ------------------------------------------------------------------
# Prefix-tree strategy (QuadPrefixTree + RecursivePrefixTreeFilter)
# and polygon relate — the NTS strategy surface beyond box+distance.
#
# The reference indexes each point as grid-cell terms at every level
# (Prefix/Tree/QuadPrefixTree.cs: DEFAULT_MAX_LEVELS = 12, quadrant
# letters per level) and a shape query walks the tree
# (Prefix/RecursivePrefixTreeFilter.cs: cells WITHIN the shape are
# accepted whole at their level, INTERSECTing cells descend until
# detailLevel, where they are kept as leaves and matched exactly).
# Spark-first: the quadkey is ONE derived column of bit arithmetic
# (whole-stage codegen, and the natural partition key at 100 TB — a
# shape query then touches only covering partitions); the covering is
# computed once on the driver (pure geometry over at most
# 4^scan_level cells) and lowered to a prefix/IN predicate; the exact
# verify (haversine or ray-cast point-in-polygon) runs only over the
# pruned candidates.  Quadrant digits 0-3 substitute the reference's
# A-D letters (same tree, printable key).


def quad_cell(lat_col: Column, lon_col: Column, level: int) -> Column:
    """Quadkey of a point at `level` as a JVM column expression: digit
    i = x-bit + 2*y-bit at depth i, x from lon, y from lat (y counts
    from the south pole up)."""
    n = 1 << level
    xi = F.least(F.lit(n - 1), F.floor(
        (lon_col + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))
    )).cast("long")
    yi = F.least(F.lit(n - 1), F.floor(
        (lat_col + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))
    )).cast("long")
    digits = []
    for i in range(level):
        shift = level - 1 - i
        dx = F.shiftright(xi, shift).bitwiseAND(F.lit(1))
        dy = F.shiftright(yi, shift).bitwiseAND(F.lit(1))
        digits.append((dx + dy * F.lit(2)).cast("string"))
    return F.concat(*digits)


def _cell_rect(key: str) -> tuple[float, float, float, float]:
    """(min_lat, max_lat, min_lon, max_lon) of a quadkey cell."""
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    for ch in key:
        d = int(ch)
        lat_mid = (lat_lo + lat_hi) / 2
        lon_mid = (lon_lo + lon_hi) / 2
        lon_lo, lon_hi = (lon_lo, lon_mid) if d % 2 == 0 else (lon_mid, lon_hi)
        lat_lo, lat_hi = (lat_lo, lat_mid) if d < 2 else (lat_mid, lat_hi)
    return lat_lo, lat_hi, lon_lo, lon_hi


def point_in_polygon_py(lat: float, lon: float, polygon) -> bool:
    """Ray-cast (even-odd) test; polygon = [(lat, lon), ...] ring,
    not necessarily closed.  Horizontal edges never cross the ray."""
    inside = False
    n = len(polygon)
    for i in range(n):
        y1, x1 = polygon[i]
        y2, x2 = polygon[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            slope = (x2 - x1) / (y2 - y1)
            if lon < slope * (lat - y1) + x1:
                inside = not inside
    return inside


def _segments_intersect(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    return ((o1 == 0 and on_seg(p1, p2, q1))
            or (o2 == 0 and on_seg(p1, p2, q2))
            or (o3 == 0 and on_seg(q1, q2, p1))
            or (o4 == 0 and on_seg(q1, q2, p2)))


def _rect_relate_polygon(rect, polygon) -> str:
    """'disjoint' | 'within' (rect fully inside polygon) |
    'intersects' — conservative, used only for cover pruning."""
    lat_lo, lat_hi, lon_lo, lon_hi = rect
    corners = [(lat_lo, lon_lo), (lat_lo, lon_hi),
               (lat_hi, lon_hi), (lat_hi, lon_lo)]
    rect_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    n = len(polygon)
    edge_hit = any(
        _segments_intersect(polygon[i], polygon[(i + 1) % n], a, b)
        for i in range(n) for a, b in rect_edges)
    corners_in = [point_in_polygon_py(la, lo, polygon)
                  for la, lo in corners]
    if not edge_hit and all(corners_in):
        return "within"
    if not edge_hit and not any(corners_in):
        # either fully outside, or the polygon sits inside the rect
        py, px = polygon[0]
        if lat_lo <= py <= lat_hi and lon_lo <= px <= lon_hi:
            return "intersects"
        return "disjoint"
    return "intersects"


def quad_covering(polygon, detail_level: int,
                  scan_level: int | None = None):
    """RecursivePrefixTreeFilter's tree walk on the driver: returns
    (prefixes, leaves).  `prefixes` are cells fully WITHIN the shape
    (match every descendant point); `leaves` are detail-level cells
    that merely intersect and need the exact verify.  The walk visits
    at most 4^level cells per level along the shape boundary — driver
    cost is O(perimeter * 2^detail_level), independent of data size."""
    if scan_level is None:
        scan_level = detail_level
    prefixes, leaves = [], []
    stack = ["0", "1", "2", "3"]
    while stack:
        key = stack.pop()
        rel = _rect_relate_polygon(_cell_rect(key), polygon)
        if rel == "disjoint":
            continue
        if rel == "within":
            prefixes.append(key)
        elif len(key) >= detail_level:
            leaves.append(key)
        else:
            stack.extend(key + d for d in "0123")
    return prefixes, leaves


def point_in_polygon(lat_col: Column, lon_col: Column,
                     polygon) -> Column:
    """Ray-cast as a pure JVM expression: one crossing test per
    polygon edge (horizontal edges dropped on the driver so no
    division guards are needed under ANSI mode), parity via sum."""
    crossings = []
    n = len(polygon)
    for i in range(n):
        y1, x1 = float(polygon[i][0]), float(polygon[i][1])
        y2, x2 = (float(polygon[(i + 1) % n][0]),
                  float(polygon[(i + 1) % n][1]))
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        cross = (
            ((F.lit(y1) > lat_col) != (F.lit(y2) > lat_col))
            & (lon_col < F.lit(slope) * (lat_col - F.lit(y1))
               + F.lit(x1)))
        crossings.append(cross.cast("int"))
    if not crossings:
        return F.lit(False)
    total = crossings[0]
    for c in crossings[1:]:
        total = total + c
    return (total % F.lit(2)) == F.lit(1)


def polygon_search(df: DataFrame, lat_col: str, lon_col: str,
                   polygon, k: int = 10, id_col: str = "doc_id",
                   detail_level: int = 8) -> DataFrame:
    """Shape (polygon) relate query — the NTS SpatialStrategy.MakeQuery
    analogue: quad-covering prefilter (prefix/IN predicates over the
    derived quadkey, partition-prunable at scale), then the exact
    ray-cast verify; constant-score rows ordered by doc id, exactly
    like the reference's ConstantScoreQuery wrap."""
    prefixes, leaves = quad_covering(polygon, detail_level)
    cell = quad_cell(F.col(lat_col), F.col(lon_col), detail_level)
    # group accepted prefixes by length: ONE set-membership test per
    # tree level (an optimized InSet each), not a per-prefix OR chain
    by_len: dict[int, list[str]] = {}
    for p in prefixes:
        by_len.setdefault(len(p), []).append(p)
    conds = []
    if leaves:
        conds.append(cell.isin(leaves))
    for ln, ps in sorted(by_len.items()):
        conds.append(F.substring(cell, 1, ln).isin(ps))
    if not conds:
        return (df.select(F.col(id_col),
                          F.lit(1.0).alias("score")).limit(0))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    pip = point_in_polygon(F.col(lat_col), F.col(lon_col), polygon)
    return (df.where(cond).where(pip)
              .select(F.col(id_col), F.lit(1.0).alias("score"))
              .orderBy(F.col(id_col).asc()).limit(k))


def distance_topk(df: DataFrame, lat_col: str, lon_col: str,
                  center_lat: float, center_lon: float,
                  radius_km: float | None = None, k: int = 10,
                  id_col: str = "doc_id") -> DataFrame:
    """k nearest rows to (center_lat, center_lon), optionally within
    radius_km — MakeDistanceValueSource ordering with the reference's
    doc-id tie-break.  Distance is rounded to 6 dp BEFORE ordering (the
    same float-reproducibility discipline as BM25 scores).

    When a radius is given, the scan is pre-filtered by the radius's
    bounding box FIRST (native predicates, parquet-prunable) so the
    haversine runs only over candidate rows — the reference's
    grid-approximate-then-verify shape."""
    if radius_km is not None:
        # bounding coordinates of a spherical cap (standard formulas): the
        # max longitude deviation is asin(sin(delta)/cos(lat)), and a cap
        # that encloses a pole spans every longitude
        delta = radius_km / EARTH_RADIUS_KM  # angular radius
        dlat = math.degrees(delta)
        lat_lo, lat_hi = center_lat - dlat, center_lat + dlat
        if lat_hi >= 90.0 or lat_lo <= -90.0:
            dlon = 180.0
        else:
            s = min(1.0, math.sin(delta)
                    / math.cos(math.radians(center_lat)))
            dlon = math.degrees(math.asin(s))
        if center_lon - dlon < -180.0 or center_lon + dlon > 180.0:
            dlon = 180.0  # antimeridian wrap: fall back to the full range
            center = 0.0
        else:
            center = center_lon
        df = box_filter(df, lat_col, lon_col,
                        max(-90.0, lat_lo), min(90.0, lat_hi),
                        center - dlon, center + dlon)
    dist = F.round(haversine_km(
        F.lit(float(center_lat)), F.lit(float(center_lon)),
        F.col(lat_col), F.col(lon_col)), 6).alias("distance_km")
    out = df.select(F.col(id_col), dist)
    if radius_km is not None:
        out = out.where(F.col("distance_km") <= float(radius_km))
    return out.orderBy(F.col("distance_km").asc(),
                       F.col(id_col).asc()).limit(k)
