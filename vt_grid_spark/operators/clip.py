"""Raw-path polygon clipping: assign polygon features to grid cells by
exact rectangle clipping — the engine's replacement for the reference's
geojson-vt slicing (tolerance 0, buffer 0, indexMaxZoom = gridZoom,
/root/reference/lib/aggregate-cells.js:54-83).

Algorithm: recursive quadtree subdivision (the geojson-vt pattern) —
clip the feature to a tile, recurse into the 4 children until gridZoom —
so cost is O(cells actually covered), not O(bbox cells).  All kernels are
numpy over coordinate arrays; the Spark surface is mapInPandas (Arrow
batches, per-feature independent → embarrassingly parallel, NO shuffle).

This path exists for geometry workloads and reference-fixture parity;
the web-page corpus is points, which take the closed-form encode
(operators/encode.py) and never touch this module.
"""

from __future__ import annotations

import json
import math
from typing import Iterator

import numpy as np

from vt_grid_spark import tilemath as tm

# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------


def clip_ring_rect(ring: np.ndarray, w: float, s: float, e: float, n: float) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring (N x 2 lon/lat, closed or open)
    against an axis-aligned rectangle.  Returns an (M x 2) open ring
    (possibly empty)."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    for axis, bound, keep_ge in ((0, w, True), (0, e, False), (1, s, True), (1, n, False)):
        if len(pts) == 0:
            return pts
        prev = np.roll(pts, 1, axis=0)
        cur_v = pts[:, axis]
        prev_v = prev[:, axis]
        cur_in = cur_v >= bound if keep_ge else cur_v <= bound
        prev_in = prev_v >= bound if keep_ge else prev_v <= bound
        out = []
        denom = cur_v - prev_v
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, (bound - prev_v) / denom, 0.0)
        inter = prev + t[:, None] * (pts - prev)
        inter[:, axis] = bound  # exact on the clip line
        for i in range(len(pts)):
            if cur_in[i]:
                if not prev_in[i]:
                    out.append(inter[i])
                out.append(pts[i])
            elif prev_in[i]:
                out.append(inter[i])
        pts = np.array(out, dtype=np.float64) if out else np.empty((0, 2))
    return pts


def passes_degenerate(coords: np.ndarray, w: float, s: float, e: float, n: float,
                      eps: float) -> bool:
    """The reference's strict-interior test, exactly
    (/root/reference/lib/degenerate.js:10-47): for each of the four edges
    independently, SOME vertex must lie strictly more than eps inside it.
    eps = 0.087 / 4^z with z the tile/cell zoom (degenerate.js:12-14)."""
    if len(coords) == 0:
        return False
    lon = coords[:, 0]
    lat = coords[:, 1]
    left = bool(np.any(lon - w > eps))
    right = bool(np.any(e - lon > eps))
    top = bool(np.any(lat - s > eps))
    bottom = bool(np.any(n - lat > eps))
    return left and right and top and bottom


def degenerate_eps(z: int) -> float:
    return 0.087 / (4.0 ** z)


def feature_passes_degenerate(geom: dict, x: int, y: int, z: int) -> bool:
    """Apply the filter to a GeoJSON geometry against tile (x,y,z) —
    per-type rules of /root/reference/lib/degenerate.js:20-46
    (Polygon: outer ring only; MultiPolygon: every polygon must pass)."""
    w, s, e, n = (float(v) for v in tm.tile_to_bbox(x, y, z))
    eps = degenerate_eps(z)
    t = geom["type"]
    if t == "Polygon":
        coords = np.asarray(geom["coordinates"][0], dtype=np.float64)
    elif t == "LineString":
        coords = np.asarray(geom["coordinates"], dtype=np.float64)
    elif t == "Point":
        coords = np.asarray([geom["coordinates"]], dtype=np.float64)
    elif t == "MultiLineString":
        coords = np.asarray([p for line in geom["coordinates"] for p in line], dtype=np.float64)
    elif t == "MultiPolygon":
        return all(
            feature_passes_degenerate({"type": "Polygon", "coordinates": rings}, x, y, z)
            for rings in geom["coordinates"]
        )
    else:
        raise ValueError(f"Unknown geometry type: {t}")
    return passes_degenerate(coords, w, s, e, n, eps)


_WGS84_R = 6378137.0


def ring_area_sq_m(ring: np.ndarray) -> float:
    """Signed spherical ring area (the geojson-area algorithm the
    reference's areaWeightedMean weights come from via
    geojson-polygon-aggregate)."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) < 3:
        return 0.0
    if not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[:1]])
    lam = np.radians(pts[:, 0])
    phi = np.radians(pts[:, 1])
    return float(np.sum((lam[1:] - lam[:-1]) * (2.0 + np.sin(phi[:-1]) + np.sin(phi[1:])))
                 * _WGS84_R * _WGS84_R / 2.0)


def polygon_area_sq_m(rings: list) -> float:
    """abs(outer) - Σ abs(holes)."""
    if not rings:
        return 0.0
    area = abs(ring_area_sq_m(np.asarray(rings[0])))
    for hole in rings[1:]:
        area -= abs(ring_area_sq_m(np.asarray(hole)))
    return area


# ---------------------------------------------------------------------------
# quadtree slicing of one feature
# ---------------------------------------------------------------------------

def slice_polygon_to_cells(rings: list, grid_z: int, root: tuple | None = None,
                           apply_filter: bool = True):
    """Yield (x, y, clipped_rings, area_sq_m) for every gridZoom cell the
    polygon covers non-degenerately.

    root=(x,y,z) restricts to that tile's progeny (the reference clips per
    source tile, lib/aggregate-cells.js:70); None walks from z0.
    """
    rings0 = [np.asarray(r, dtype=np.float64) for r in rings]
    eps = degenerate_eps(grid_z)

    def rec(x: int, y: int, z: int, rs: list):
        w, s, e, n = (float(v) for v in tm.tile_to_bbox(x, y, z))
        outer = clip_ring_rect(rs[0], w, s, e, n)
        if len(outer) < 3:
            return
        clipped = [outer]
        for r in rs[1:]:
            c = clip_ring_rect(r, w, s, e, n)
            if len(c) >= 3:
                clipped.append(c)
        if z == grid_z:
            if apply_filter and not passes_degenerate(clipped[0], w, s, e, n, eps):
                return
            area = abs(ring_area_sq_m(clipped[0]))
            for hole in clipped[1:]:
                area -= abs(ring_area_sq_m(hole))
            yield_list.append((x, y, [c.tolist() for c in clipped], area))
            return
        for cx, cy, cz in tm.children(x, y, z):
            rec(cx, cy, cz, clipped)

    yield_list: list = []
    if root is None:
        rec(0, 0, 0, rings0)
    else:
        rec(root[0], root[1], root[2], rings0)
    return yield_list


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

CLIP_SCHEMA = (
    "feature_id long, x long, y long, zoom int, area double"
)


def clip_features_to_cells(df, grid_z: int, value_cols: list[str],
                           root_cols: bool = False):
    """mapInPandas operator: rows (feature_id, geometry_json [, tile_x,
    tile_y, tile_z], value columns...) -> one row per (feature, covered
    cell) with the clipped-intersection area as the AWM weight.

    Per-feature independent — Arrow-batched, no shuffle; the groupBy that
    follows (cell aggregation) is the only exchange, same as the
    reference's per-tile fan-out (SURVEY.md §3 lifecycle mapping).
    """
    schema = CLIP_SCHEMA + "".join(
        f", {c} double" for c in value_cols
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ["feature_id", "x", "y", "zoom", "area", *value_cols]}
            for row in pdf.itertuples(index=False):
                geom = json.loads(row.geometry_json)
                root = (int(row.tile_x), int(row.tile_y), int(row.tile_z)) if root_cols else None
                if geom["type"] == "Polygon":
                    polys = [geom["coordinates"]]
                elif geom["type"] == "MultiPolygon":
                    polys = geom["coordinates"]
                else:
                    raise ValueError(f"clip path supports polygons, got {geom['type']}")
                cells: dict[tuple, float] = {}
                for rings in polys:
                    for x, y, _, area in slice_polygon_to_cells(rings, grid_z, root=root):
                        cells[(x, y)] = cells.get((x, y), 0.0) + area
                for (x, y), area in cells.items():
                    out["feature_id"].append(row.feature_id)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["zoom"].append(grid_z)
                    out["area"].append(area)
                    for c in value_cols:
                        out[c].append(float(getattr(row, c)))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=schema)
