"""Property-based tests (hypothesis) over the pure kernels: tile math,
quadkeys, cover ranges, MVT wire primitives.  No SparkSession — these run
in milliseconds and fuzz the determinism anchor everything else trusts."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vt_grid_spark import tilemath as tm
from vt_grid_spark.sources import mvt

LON = st.floats(min_value=-179.999999, max_value=179.999999,
                allow_nan=False, allow_infinity=False)
LAT = st.floats(min_value=-84.9, max_value=84.9,
                allow_nan=False, allow_infinity=False)
Z = st.integers(min_value=1, max_value=22)


@given(LON, LAT, Z)
@settings(max_examples=300, deadline=None)
def test_point_lands_in_own_tile_bbox(lon, lat, z):
    x, y = (int(v) for v in tm.point_to_tile(lon, lat, z))
    w, s, e, n = (float(v) for v in tm.tile_to_bbox(x, y, z))
    tol = 1e-9  # one-ulp slack at the floor boundary
    assert w - tol <= lon <= e + tol
    assert s - tol <= lat <= n + tol


@given(Z, st.data())
@settings(max_examples=300, deadline=None)
def test_quadkey_roundtrip_and_parent_prefix(z, data):
    n = (1 << z) - 1
    x = data.draw(st.integers(min_value=0, max_value=n))
    y = data.draw(st.integers(min_value=0, max_value=n))
    qk = str(tm.tile_to_quadkey(x, y, z))
    assert len(qk) == z
    assert tm.quadkey_to_tile(qk) == (x, y, z)
    if z > 1:
        pq = str(tm.tile_to_quadkey(x >> 1, y >> 1, z - 1))
        assert qk[:-1] == pq  # getParent == drop-last-char
    # children carry the parent's quadkey as a prefix
    for cx, cy, cz in tm.children(x, y, z):
        if cz <= 22:
            assert str(tm.tile_to_quadkey(cx, cy, cz)).startswith(qk)


@given(st.integers(min_value=2, max_value=12), st.data())
@settings(max_examples=200, deadline=None)
def test_bbox_cover_contains_member_points(z, data):
    w = data.draw(st.floats(min_value=-179.0, max_value=170.0))
    s = data.draw(st.floats(min_value=-80.0, max_value=75.0))
    e = data.draw(st.floats(min_value=w + 1e-6, max_value=179.0))
    n = data.draw(st.floats(min_value=s + 1e-6, max_value=80.0))
    lon = data.draw(st.floats(min_value=w, max_value=e))
    lat = data.draw(st.floats(min_value=s, max_value=n))
    x0, x1, y0, y1 = tm.bbox_to_tile_range((w, s, e, n), z)
    px, py = (int(v) for v in tm.point_to_tile(lon, lat, z))
    assert x0 <= px <= x1
    assert y0 <= py <= y1


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    buf = bytearray()
    for v in vals:
        mvt._write_varint(buf, v)
    pos, out = 0, []
    while pos < len(buf):
        v, pos = mvt._read_varint(bytes(buf), pos)
        out.append(v)
    assert out == vals


@given(st.integers(min_value=-(2**62), max_value=2**62 - 1))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip(v):
    assert mvt._zigzag_decode(mvt._zigzag_encode(v)) == v


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_mvt_point_tile_roundtrip(data):
    z = data.draw(st.integers(min_value=1, max_value=14))
    nmax = (1 << z) - 1
    x = data.draw(st.integers(min_value=0, max_value=nmax))
    y = data.draw(st.integers(min_value=0, max_value=nmax))
    pts = data.draw(st.lists(
        st.tuples(st.integers(min_value=0, max_value=4095),
                  st.integers(min_value=0, max_value=4095)),
        min_size=1, max_size=8))
    feats = [{"geom_type": 1, "parts": [[p]], "props": {"i": i}, "id": i}
             for i, p in enumerate(pts)]
    blob = mvt.encode_tile({"l": feats}, compress=data.draw(st.booleans()))
    decoded = mvt.decode_tile(blob, x, y, z)
    assert len(decoded) == len(pts)
    for f in decoded:
        px, py = pts[f["id"]]
        lon = float(tm.tile_to_lon(x + px / 4096.0, z))
        lat = float(tm.tile_to_lat(y + py / 4096.0, z))
        assert f["geometry"]["coordinates"] == [lon, lat]
        assert f["properties"] == {"i": f["id"]}


# ---------------------------------------------------------------------------
# PIP refine kernel: the interval-stabbing implementation (sorted lats +
# searchsorted per edge y-span) must match a straightforward scalar
# even-odd ray cast on arbitrary polygons — including degenerate rings
# with horizontal edges, repeated vertices, and duplicate point lats.
# ---------------------------------------------------------------------------

@given(st.data())
@settings(max_examples=150, deadline=None)
def test_pip_interval_stabbing_matches_scalar_raycast(data):
    from vt_grid_spark.operators.spatial_join import points_in_polygon_numpy

    coord = st.integers(min_value=-20, max_value=20)  # ints force exact ties
    n_v = data.draw(st.integers(min_value=3, max_value=12))
    ring = [[float(data.draw(coord)), float(data.draw(coord))]
            for _ in range(n_v)]
    n_p = data.draw(st.integers(min_value=1, max_value=60))
    lon = np.array([float(data.draw(coord)) + data.draw(
        st.sampled_from([0.0, 0.5])) for _ in range(n_p)])
    lat = np.array([float(data.draw(coord)) + data.draw(
        st.sampled_from([0.0, 0.5])) for _ in range(n_p)])

    def scalar(lon, lat, rings):
        inside = np.zeros(len(lon), dtype=bool)
        for rg in rings:
            r = np.asarray(rg, dtype=np.float64)
            if len(r) and np.array_equal(r[0], r[-1]):
                r = r[:-1]
            x1, y1 = r[:, 0], r[:, 1]
            x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
            for i in range(len(r)):
                cond = (y1[i] > lat) != (y2[i] > lat)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (x2[i] - x1[i]) * (lat - y1[i]) / (y2[i] - y1[i]) + x1[i]
                inside ^= cond & (lon < xint)
        return inside

    got = points_in_polygon_numpy(lon, lat, [ring], chunk_elems=data.draw(
        st.sampled_from([7, 64, 32_000_000])))  # tiny chunks hit the batching
    want = scalar(lon, lat, [ring])
    assert np.array_equal(got, want)
