"""Spatial joins: point-in-polygon via the cover/refine pattern.

Not present in the reference (SURVEY.md §2.5 — it has no joins); required
by the north rule.  Design for 100 TB:

  1. COVER (small side): slice each polygon into its covering cells at a
     fixed zoom (reusing the clip quadtree, filter off) — this is the
     polygon's "index".  Polygons are the dimension table; the cover is
     broadcast.
  2. EQUI-JOIN: points encoded at the same zoom equi-join the cover on
     (x, y) — a broadcast hash join, NO shuffle of the fact table.
  3. REFINE: exact even-odd ray-casting test, vectorized numpy inside a
     pandas UDF over Arrow batches (only candidate rows pay it).

Interior cells skip refinement entirely: the cover marks cells wholly
inside a polygon ``full``, and the candidate set is split JVM-side on that
flag — full-cell rows are accepted with no Arrow crossing, only
boundary-cell rows pay the exact test.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from vt_grid_spark import tilemath as tm
from vt_grid_spark.operators.clip import clip_ring_rect
from vt_grid_spark.operators.encode import encode_points


def polygon_cover_cells(rings: list, z: int):
    """(x, y, full) cells overlapping the polygon at zoom z; ``full`` marks
    cells wholly inside (no refine needed).  Quadtree descent, O(covered)."""
    out = []
    rings0 = [np.asarray(r, dtype=np.float64) for r in rings]

    def rec(x, y, zz, rs):
        w, s, e, n = (float(v) for v in tm.tile_to_bbox(x, y, zz))
        outer = clip_ring_rect(rs[0], w, s, e, n)
        if len(outer) < 3:
            return
        holes = [clip_ring_rect(r, w, s, e, n) for r in rs[1:]]
        holes = [h for h in holes if len(h) >= 3]
        if zz == z:
            # full iff the clipped outer covers the cell's planar area
            # exactly and no hole intrudes (shoelace vs rect area)
            full = False
            if not holes:
                xx, yy = outer[:, 0], outer[:, 1]
                area2 = abs(float(np.dot(xx, np.roll(yy, -1)) - np.dot(yy, np.roll(xx, -1))))
                rect2 = 2.0 * (e - w) * (n - s)
                full = abs(area2 - rect2) <= 1e-9 * rect2
            out.append((x, y, full))
            return
        for cx, cy, cz in tm.children(x, y, zz):
            rec(cx, cy, cz, [outer] + holes)

    rec(0, 0, 0, rings0)
    return out


def points_in_polygon_numpy(lon: np.ndarray, lat: np.ndarray, rings: list) -> np.ndarray:
    """Vectorized even-odd ray casting for N points against one polygon
    (outer ring + holes). Half-open edge semantics (standard crossing rule)."""
    inside = np.zeros(len(lon), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for i in range(len(r)):
            cond = ((y1[i] > lat) != (y2[i] > lat))
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2[i] - x1[i]) * (lat - y1[i]) / (y2[i] - y1[i]) + x1[i]
            inside ^= cond & (lon < xint)
    return inside


def _make_pip_udf(geoms: dict):
    """Vectorized refine UDF with the polygon dict captured in the closure
    (broadcast with the task) — only (lon, lat, poly_id) cross Arrow, not
    a geometry string per row.  It is applied ONLY to boundary-cell rows:
    the candidate set is split JVM-side on the cover's ``full`` flag, so
    rows in cells wholly inside a polygon never pay the Arrow transfer at
    all (r1 bench: ~most of pip wall time was full-cell rows crossing into
    Python just to return True)."""

    def kernel(lon: pd.Series, lat: pd.Series, poly_id: pd.Series) -> pd.Series:
        lon_v = lon.to_numpy(dtype=np.float64)
        lat_v = lat.to_numpy(dtype=np.float64)
        pid_v = poly_id.to_numpy()
        out = np.zeros(len(lon_v), dtype=bool)
        for pid in pd.unique(pid_v):
            polys = geoms[pid]
            pos = np.nonzero(pid_v == pid)[0]
            hit = np.zeros(len(pos), dtype=bool)
            for rings in polys:
                hit |= points_in_polygon_numpy(lon_v[pos], lat_v[pos], rings)
            out[pos] = hit
        return pd.Series(out)

    return pandas_udf(kernel, "boolean")


def point_in_polygon_join(points: DataFrame, polygons: DataFrame, z: int = 9,
                          lon: str = "lon", lat: str = "lat",
                          poly_id: str = "poly_id",
                          geometry_json: str = "geometry_json") -> DataFrame:
    """points ⋈ polygons (containment). polygons is the SMALL side.

    Returns the points columns + poly_id.  Broadcast cover join + exact
    refine; full cells skip the refine UDF entirely.
    """
    spark = points.sparkSession
    polys = polygons.select(poly_id, geometry_json).collect()
    cover_rows = []
    geoms: dict = {}
    for r in polys:
        geom = json.loads(r[geometry_json])
        rings_list = [geom["coordinates"]] if geom["type"] == "Polygon" else geom["coordinates"]
        geoms[r[poly_id]] = rings_list
        seen: dict[tuple, bool] = {}
        for rings in rings_list:
            for x, y, full in polygon_cover_cells(rings, z):
                seen[(x, y)] = seen.get((x, y), False) or full
        for (x, y), full in seen.items():
            cover_rows.append((r[poly_id], int(x), int(y), bool(full)))
    cover = spark.createDataFrame(
        cover_rows, f"{poly_id} long, x long, y long, full boolean")

    enc = encode_points(points, z, lon=lon, lat=lat, with_quadkey=False)
    cand = enc.join(F.broadcast(cover), ["x", "y"])
    # JVM-side split on the cover's `full` flag: rows in cells wholly
    # inside a polygon are accepted with ZERO Arrow traffic; only
    # boundary-cell rows enter the exact-refine UDF.  The split sits
    # AFTER the broadcast join, so the upstream scan+encode is narrow and
    # cheap to evaluate per branch (no shuffle is repeated).
    inside = cand.where(F.col("full"))
    pip_udf = _make_pip_udf(geoms)
    boundary = cand.where(~F.col("full")).where(
        pip_udf(F.col(lon), F.col(lat), F.col(poly_id)))
    return inside.unionByName(boundary).drop("x", "y", "zoom", "full")
