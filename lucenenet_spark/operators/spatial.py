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
