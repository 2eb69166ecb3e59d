"""CellIndex contract (SURVEY.md: "the quadkey hierarchy plays the H3/S2
role ... with the encoder behind an interface"): both engines must satisfy
point->cell / parent / children / neighbors invariants."""

import math

from pyspark.sql import functions as F

from vt_grid_spark.cellindex import HexIndex, QuadkeyIndex
from vt_grid_spark.sources import pages

SIZE = 0.75


def _pts(spark, n=600):
    return pages.with_coords(pages.pages_df(spark, n)).select("lon", "lat")


def _hex_center(q, r, size=SIZE):
    return (size * 1.5 * q,
            size * (math.sqrt(3.0) / 2.0 * q + math.sqrt(3.0) * r))


def _unpack(cell):
    return (cell >> 32) - (1 << 30), (cell & 0xFFFFFFFF) - (1 << 30)


def test_hex_assignment_is_nearest_center(spark):
    """Cube rounding must pick the closest hex center: the distance to the
    assigned cell's center is <= distance to each of its 6 neighbors'
    centers (ties allowed at exact boundaries)."""
    ix = HexIndex(SIZE)
    rows = (_pts(spark)
            .withColumn("cell", ix.cell(F.col("lon"), F.col("lat")))
            .withColumn("nbrs", ix.neighbors(F.col("cell")))
            .collect())
    assert rows
    for row in rows:
        q, r = _unpack(row.cell)
        cx, cy = _hex_center(q, r)
        d0 = (row.lon - cx) ** 2 + (row.lat - cy) ** 2
        for nb in row.nbrs:
            nq, nr = _unpack(nb)
            nx, ny = _hex_center(nq, nr)
            d1 = (row.lon - nx) ** 2 + (row.lat - ny) ** 2
            assert d0 <= d1 + 1e-9, (q, r, nq, nr)


def test_hex_neighbors_mutual_and_distinct(spark):
    ix = HexIndex(SIZE)
    df = (_pts(spark, 200)
          .withColumn("cell", ix.cell(F.col("lon"), F.col("lat")))
          .select("cell").distinct()
          .withColumn("nbrs", ix.neighbors(F.col("cell"))))
    rows = df.collect()
    nbr_map = {}
    for row in rows:
        assert len(set(row.nbrs)) == 6
        assert row.cell not in row.nbrs
        nbr_map[row.cell] = set(row.nbrs)
    for c, ns in nbr_map.items():
        for n in ns:
            if n in nbr_map:
                assert c in nbr_map[n]


def test_hex_parent_children_invert(spark):
    """Every fine hex has exactly one parent and appears in that parent's
    children() — the aperture partition is exact even though boundary
    containment is approximate."""
    ix = HexIndex(SIZE, aperture=3)
    df = (_pts(spark, 400)
          .withColumn("cell", ix.cell(F.col("lon"), F.col("lat")))
          .select("cell").distinct()
          .withColumn("parent", ix.parent(F.col("cell")))
          .withColumn("kids", ix.children(F.col("parent"))))
    rows = df.collect()
    assert rows
    for row in rows:
        assert row.cell in row.kids, _unpack(row.cell)
    # children partition: one fine cell never claimed by two parents
    fine = (df.select(F.col("parent"), F.explode("kids").alias("kid"))
            .distinct().groupBy("kid").count().where("count > 1").count())
    assert fine == 0


def test_quadkey_high_zoom_exact_roundtrip(spark):
    """z=28 pack/unpack/parent/neighbors round-trip vs the numpy twin.

    cell = x*2^z + y exceeds 2^53 here, so any double-precision step in
    the decode (the old ``cell / n`` path) flips low bits of y — the xy
    decode must stay in integer bit math at every zoom (VERDICT r4 #1)."""
    import numpy as np

    z = 28
    n = 1 << z
    ix = QuadkeyIndex(z)
    rng = np.random.RandomState(42)
    xs = np.concatenate([rng.randint(0, n, 200),
                         np.array([0, 1, n - 1, n // 2, n - 2])]).astype(np.int64)
    ys = np.concatenate([rng.randint(0, n, 200),
                         np.array([0, n - 1, 1, n // 2 + 1, n - 1])]).astype(np.int64)
    cells = xs * n + ys
    assert int(cells.max()) > (1 << 53)  # the regime double division breaks in
    df = spark.createDataFrame(
        [(int(c),) for c in cells], "cell long")
    cx, cy = ix.xy(F.col("cell"))
    got = (df.withColumn("x", cx).withColumn("y", cy)
           .withColumn("parent", ix.parent(F.col("cell")))
           .withColumn("nbrs", ix.neighbors(F.col("cell")))
           .withColumn("kids", QuadkeyIndex(z - 1).children(ix.parent(F.col("cell"))))
           .collect())
    by_cell = {r.cell: r for r in got}
    for x, y, c in zip(xs, ys, cells):
        r = by_cell[int(c)]
        assert (r.x, r.y) == (int(x), int(y)), (r.x, r.y, int(x), int(y))
        # numpy twin: parent via integer shifts at z-1
        assert r.parent == (int(x) >> 1) * (1 << (z - 1)) + (int(y) >> 1)
        assert int(c) in r.kids and len(r.kids) == 4
        # neighbors: exact 8-neighborhood with x wrap, y clamp
        exp = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                ny = int(y) + dy
                if 0 <= ny < n:
                    exp.add(((int(x) + dx) % n) * n + ny)
        assert set(r.nbrs) == exp


def test_quadkey_index_contract(spark):
    from vt_grid_spark.operators.encode import encode_points

    z = 7
    ix = QuadkeyIndex(z)
    pts = pages.with_coords(pages.pages_df(spark, 300))
    got = (ix.encode(pts).withColumn("parent", ix.parent(F.col("cell")))
           .withColumn("kids", QuadkeyIndex(z - 1).children(F.col("parent")))
           .withColumn("nbrs", ix.neighbors(F.col("cell"))))
    enc = {r.url: (r.x, r.y) for r in encode_points(pts, z, with_quadkey=False)
           .select("url", "x", "y").collect()}
    for row in got.select("url", "cell", "parent", "kids", "nbrs").collect():
        x, y = enc[row.url]
        assert row.cell == x * (1 << z) + y  # same cell as encode_points
        assert row.parent == (x >> 1) * (1 << (z - 1)) + (y >> 1)
        assert row.cell in row.kids and len(row.kids) == 4
        interior = 0 < y < (1 << z) - 1
        assert len(row.nbrs) == (8 if interior else 5)
        assert len(set(row.nbrs)) == len(row.nbrs)
