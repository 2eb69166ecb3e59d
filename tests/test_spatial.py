"""Spatial joins, kNN, raster<->vector."""

import json

import numpy as np
from pyspark.sql import functions as F

from vt_grid_spark.operators import raster
from vt_grid_spark.operators.knn import knn_bruteforce, knn_cells
from vt_grid_spark.operators.spatial_join import (
    point_in_polygon_join, points_in_polygon_numpy, polygon_cover_cells)
from vt_grid_spark.sources import pages

DIAMOND = {  # diamond around (-74.0, 40.7) — inside the corpus hot cluster
    "type": "Polygon",
    "coordinates": [[[-74.4, 40.7], [-74.0, 41.05], [-73.6, 40.7], [-74.0, 40.35],
                     [-74.4, 40.7]]],
}


def test_pip_numpy_even_odd():
    rings = DIAMOND["coordinates"]
    lon = np.array([-74.0, -74.0, -75.0, -73.61, -74.39])
    lat = np.array([40.7, 41.2, 40.7, 40.7, 40.7])
    got = points_in_polygon_numpy(lon, lat, rings)
    assert got.tolist() == [True, False, False, True, True]
    # hole subtracts
    hole = [[-74.1, 40.6], [-74.1, 40.8], [-73.9, 40.8], [-73.9, 40.6], [-74.1, 40.6]]
    got2 = points_in_polygon_numpy(np.array([-74.0]), np.array([40.7]),
                                   [rings[0], hole])
    assert got2.tolist() == [False]


def test_polygon_cover_marks_full_cells():
    cover = polygon_cover_cells(DIAMOND["coordinates"], 11)
    assert len(cover) > 8
    fulls = [c for c in cover if c[2]]
    partials = [c for c in cover if not c[2]]
    assert fulls and partials  # a z11 cell is ~0.18 deg: some wholly inside


def test_pip_join_matches_bruteforce(spark):
    pts = pages.with_coords(pages.pages_df(spark, 3000))
    polys = spark.createDataFrame(
        [(1, json.dumps(DIAMOND))], "poly_id long, geometry_json string")
    joined = point_in_polygon_join(pts, polys, z=9)
    got = {r.url for r in joined.collect()}

    rows = pts.select("url", "lon", "lat").collect()
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    mask = points_in_polygon_numpy(lon, lat, DIAMOND["coordinates"])
    want = {r.url for r, m in zip(rows, mask) if m}
    assert got == want
    assert len(want) > 50  # hot cluster lives inside the diamond


def test_knn_cells_equals_bruteforce(spark):
    pts = pages.with_coords(pages.pages_df(spark, 3000))
    queries = spark.createDataFrame(
        [(1, -74.0, 40.7), (2, 10.0, 50.0), (3, 139.7, 35.6)],
        "qid long, lon double, lat double")
    brute = knn_bruteforce(pts, queries, 5)
    cells = knn_cells(pts, queries, 5, z=6, ring=1)
    b = sorted((r.qid, r.rank, r.url) for r in brute.collect())
    c = sorted((r.qid, r.rank, r.url) for r in cells.collect())
    assert b == c
    assert len(b) == 15


def _blocks(spark, k=4, nblocks=8):
    side2 = (1 << k) ** 2
    return spark.range(nblocks).select(
        F.lit(8).alias("tile_z"),
        (F.col("id") % 4 + 100).alias("tile_x"),
        (F.col("id") / 4 + 80).cast("long").alias("tile_y"),
        F.transform(
            F.sequence(F.lit(0), F.lit(side2 - 1)),
            lambda p: ((F.col("id") * 31 + p * 7) % 100).cast("double"),
        ).alias("band"),
    )


def test_raster_to_cells_conserves_sum(spark):
    k = 4
    blocks = _blocks(spark, k)
    cells = raster.raster_to_cells(blocks, k=k, drop_zero=False)
    per_block = (
        cells.groupBy(F.shiftright("x", k).alias("tile_x"),
                      F.shiftright("y", k).alias("tile_y"))
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {(r.tile_x, r.tile_y): sum(r.band) for r in blocks.collect()}
    assert len(per_block) == 8
    for r in per_block:
        assert r.n == (1 << k) ** 2
        assert abs(r.s - want[(r.tile_x, r.tile_y)]) < 1e-9
    # cell zoom is tile_z + k
    assert cells.select("zoom").distinct().collect()[0].zoom == 12


def test_raster_roundtrip(spark):
    k = 4
    blocks = _blocks(spark, k)
    cells = raster.raster_to_cells(blocks, k=k, drop_zero=False)
    back = raster.cells_to_raster(cells, k=k)
    a = {(r.tile_x, r.tile_y): list(r.band) for r in blocks.collect()}
    b = {(r.tile_x, r.tile_y): list(r.band) for r in back.collect()}
    assert a == b
