"""Geometry parity vs the reference's own fixtures:

1. degenerate filter keeps exactly 4/12 and 4/16 features
   (/root/reference/test/lib/degenerate.js:7-19);
2. raw clip of the 5-polygon fixture at gridZoom 19 covers exactly the
   1024 progeny cells of tile z14 (9631,8139) and areaWeightedMean stays
   within the input range (/root/reference/test/lib/aggregate-cells.js:9-26);
3. e2e dc golden: pyramid from dc.geojson — the z15 cells with
   sum(data) > 0 are exactly the 237 golden quadkeys
   (/root/reference/test/index.js:39-47).
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vt_grid_spark import tilemath as tm
from vt_grid_spark.operators import clip

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _load(name):
    with open(os.path.join(FIX, name)) as f:
        return json.load(f)


def test_degenerate_filter_counts():
    feats = _load("degenerate-features.geojson")
    kept = [f for f in feats
            if clip.feature_passes_degenerate(f["geometry"], 9393, 12516, 15)]
    assert len(kept) == 4

    feats2 = _load("degenerate-features-2.geojson")
    kept2 = [f for f in feats2
             if clip.feature_passes_degenerate(f["geometry"], 9370, 12525, 15)]
    assert len(kept2) == 4


def test_raw_clip_1024_cells_awm_bounds():
    fc = _load("aggregate-cells.input.geojson")
    # accumulate AWM partials per cell over all 5 features
    w_sum: dict = {}
    wv_sum: dict = {}
    for feat in fc["features"]:
        v = float(feat["properties"]["densitypph"])
        rings = feat["geometry"]["coordinates"]
        for x, y, _, area in clip.slice_polygon_to_cells(
                rings, 19, root=(9631, 8139, 14)):
            w_sum[(x, y)] = w_sum.get((x, y), 0.0) + area
            wv_sum[(x, y)] = wv_sum.get((x, y), 0.0) + area * v
    # the fixture covers the whole tile: every one of the 1024 progeny cells
    xs, ys = tm.progeny(9631, 8139, 14, 19)
    assert set(zip(xs.tolist(), ys.tolist())) == set(w_sum)
    assert len(w_sum) == 1024
    for k in w_sum:
        awm = wv_sum[k] / w_sum[k]
        assert 0.0 - 1e-9 <= awm <= 2.0 + 1e-9


def test_clip_spark_operator_matches_local(spark):
    fc = _load("aggregate-cells.input.geojson")
    rows = [(i, json.dumps(f["geometry"]), float(f["properties"]["densitypph"]))
            for i, f in enumerate(fc["features"])]
    df = spark.createDataFrame(rows, "feature_id long, geometry_json string, densitypph double")
    out = clip.clip_features_to_cells(df, 19, ["densitypph"])
    cells = (
        out.groupBy("x", "y")
        .agg((F.sum(F.col("area") * F.col("densitypph")) / F.sum("area")).alias("awm"))
        .collect()
    )
    assert len(cells) == 1024
    assert all(-1e-9 <= r.awm <= 2.0 + 1e-9 for r in cells)


def test_dc_golden_quadkeys(spark):
    """Full-fidelity e2e: clip dc polygons at z16 cells, roll up to z15,
    positive-set must equal the reference golden (order-insensitive,
    presence+value semantics like test/index.js:39-47)."""
    fc = _load("dc.geojson")
    rows = [(i, json.dumps(f["geometry"]), float(f["properties"]["data"]))
            for i, f in enumerate(fc["features"])]
    df = spark.createDataFrame(rows, "feature_id long, geometry_json string, data double")

    pieces = clip.clip_features_to_cells(df, 16, ["data"])
    z16 = pieces.groupBy("x", "y").agg(F.sum("data").alias("sum_data"))
    z15 = (
        z16.groupBy(F.shiftright("x", 1).alias("x"), F.shiftright("y", 1).alias("y"))
        .agg(F.sum("sum_data").alias("sum_data"))
        .collect()
    )
    positive = {tm.tile_to_quadkey(r.x, r.y, 15) for r in z15 if r.sum_data > 0}

    with open(os.path.join(FIX, "dc.z12-grid-quadkeys.txt")) as f:
        golden = {l.strip() for l in f if l.strip()}
    assert len(golden) == 237
    missing = golden - positive
    extra = positive - golden
    assert not missing, f"{len(missing)} golden cells missing: {sorted(missing)[:5]}"
    assert not extra, f"{len(extra)} extra positive cells: {sorted(extra)[:5]}"


def test_line_clip_conserves_length():
    """Sum of per-cell clipped lengths == whole-polyline length (filter off)."""
    import numpy as np

    from vt_grid_spark.operators.clip import _EARTH_R, clip_segments_to_cells

    line = np.array([[-10.2, 40.1], [5.7, 47.3], [19.9, 41.8]])
    cells = clip_segments_to_cells(line, grid_z=5, apply_filter=False)
    assert len(cells) >= 4  # spans several z5 cells
    total = 0.0
    for (a, b) in zip(line[:-1], line[1:]):
        mid = np.radians((a[1] + b[1]) * 0.5)
        dlam = np.radians(b[0] - a[0]) * np.cos(mid)
        dphi = np.radians(b[1] - a[1])
        total += _EARTH_R * float(np.sqrt(dphi * dphi + dlam * dlam))
    # cos(mid-lat) varies slightly per clipped piece; per-segment midpoints
    # differ from per-piece midpoints, so allow a small relative tolerance
    assert abs(sum(cells.values()) - total) / total < 2e-3


def test_line_clip_axis_parallel():
    import numpy as np

    from vt_grid_spark.operators.clip import clip_segments_to_cells

    horiz = np.array([[-20.0 + 0.0005, 30.0005], [15.0, 30.0005]])
    vert = np.array([[10.0005, -25.0], [10.0005, 20.0]])
    ch = clip_segments_to_cells(horiz, grid_z=5, apply_filter=False)
    cv = clip_segments_to_cells(vert, grid_z=5, apply_filter=False)
    assert len(ch) >= 3 and len(cv) >= 4
    assert len({y for (_, y) in ch}) == 1  # horizontal stays in one row
    assert len({x for (x, _) in cv}) == 1  # vertical stays in one column


def test_line_clip_degenerate_sliver_filtered():
    """A segment hugging a cell edge (within eps) must be filtered in that
    cell — the strict-interior rule for LineStrings (degenerate.js:26)."""
    import numpy as np

    from vt_grid_spark import tilemath as tm
    from vt_grid_spark.operators.clip import clip_segments_to_cells, degenerate_eps

    z = 5
    w, s, e, n = (float(v) for v in tm.tile_to_bbox(16, 12, z))
    eps = degenerate_eps(z)
    hug = np.array([[w + eps * 0.25, s + 1.0], [w + eps * 0.25, n - 1.0]])
    cells = clip_segments_to_cells(hug, grid_z=z)
    assert (16, 12) not in cells           # sliver filtered
    inner = np.array([[w + 1.0, s + 1.0], [w + 1.0, n - 1.0]])
    cells2 = clip_segments_to_cells(inner, grid_z=z)
    assert (16, 12) in cells2
