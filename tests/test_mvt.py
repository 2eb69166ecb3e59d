"""True MVT/PBF + MBTiles ingest (reference S3 scan path,
/root/reference/bench/read-tiles.js:24-45): wire-format round-trips,
TMS row flip, gzip handling, Arrow-batched distributed decode."""

import gzip
import json

import numpy as np
import pytest

from vt_grid_spark import tilemath as tm
from vt_grid_spark.sources import mvt

TILE = (6, 32, 25)


def _point_layer():
    # three points + one tagged polygon in extent space
    feats = [
        {"geom_type": 1, "parts": [[(100, 200)]], "props": {"n": 7}, "id": 1},
        {"geom_type": 1, "parts": [[(4000, 4095)]], "props": {"n": 9}, "id": 2},
        {"geom_type": 1, "parts": [[(0, 0)]], "props": {"lang": "en"}, "id": 3},
        {"geom_type": 3,
         "parts": [[(10, 10), (10, 500), (500, 500), (500, 10), (10, 10)]],
         "props": {"data": 1.5}, "id": 4},
    ]
    return {"pages": feats}


def test_encode_decode_roundtrip():
    z, x, y = TILE
    blob = mvt.encode_tile(_point_layer(), compress=True)
    assert blob[:2] == b"\x1f\x8b"  # gzipped like reference tiles
    feats = mvt.decode_tile(blob, x, y, z)
    assert len(feats) == 4
    assert {f["layer"] for f in feats} == {"pages"}
    by_id = {f["id"]: f for f in feats}
    assert by_id[1]["properties"] == {"n": 7}
    assert by_id[3]["properties"] == {"lang": "en"}
    assert by_id[4]["properties"] == {"data": 1.5}
    # point coordinates follow toGeoJSON semantics exactly
    lon = float(tm.tile_to_lon(x + 100 / 4096.0, z))
    lat = float(tm.tile_to_lat(y + 200 / 4096.0, z))
    assert by_id[1]["geometry"]["coordinates"] == [lon, lat]
    # polygon ring closed, 5 vertices
    ring = by_id[4]["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]


def test_decode_uncompressed_and_linestring():
    z, x, y = TILE
    layers = {"roads": [
        {"geom_type": 2, "parts": [[(0, 0), (100, 100), (200, 100)]],
         "props": {"km": 2}, "id": 10},
    ]}
    blob = mvt.encode_tile(layers, compress=False)
    feats = mvt.decode_tile(blob, x, y, z)
    assert feats[0]["geometry"]["type"] == "LineString"
    assert len(feats[0]["geometry"]["coordinates"]) == 3


def test_multipoint_roundtrip():
    """A MultiPoint feature is N MoveTo parts of one vertex each; decode
    must keep every point (regression: only the first survived)."""
    z, x, y = TILE
    pts = [(100, 200), (700, 900), (3000, 50)]
    layers = {"pages": [
        {"geom_type": 1, "parts": [[p] for p in pts], "props": {}, "id": 1},
    ]}
    feats = mvt.decode_tile(mvt.encode_tile(layers), x, y, z)
    g = feats[0]["geometry"]
    assert g["type"] == "MultiPoint"
    assert len(g["coordinates"]) == 3
    for (px, py), (lon, lat) in zip(pts, g["coordinates"]):
        assert abs(lon - float(tm.tile_to_lon(x + px / 4096.0, z))) < 1e-9
        assert abs(lat - float(tm.tile_to_lat(y + py / 4096.0, z))) < 1e-9


def test_multipolygon_ring_classification():
    """Two exterior rings (positive shoelace area in y-down tile space) +
    one hole: decode classifies by winding into MultiPolygon with the hole
    attached to the FIRST polygon, matching vector-tile classifyRings."""
    z, x, y = TILE
    ext1 = [(10, 10), (500, 10), (500, 500), (10, 500), (10, 10)]        # CW on screen
    hole = [(100, 100), (100, 200), (200, 200), (200, 100), (100, 100)]  # CCW
    ext2 = [(1000, 1000), (2000, 1000), (2000, 2000), (1000, 2000), (1000, 1000)]
    layers = {"adm": [
        {"geom_type": 3, "parts": [ext1, hole, ext2], "props": {}, "id": 1},
    ]}
    feats = mvt.decode_tile(mvt.encode_tile(layers), x, y, z)
    g = feats[0]["geometry"]
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    assert len(g["coordinates"][0]) == 2  # exterior + hole
    assert len(g["coordinates"][1]) == 1  # exterior only
    # single exterior ring still decodes as plain Polygon
    solo = mvt.decode_tile(mvt.encode_tile(
        {"adm": [{"geom_type": 3, "parts": [ext1], "props": {}, "id": 2}]}), x, y, z)
    assert solo[0]["geometry"]["type"] == "Polygon"


def test_value_negative_int_and_mixed_type_dedup():
    """field-4 int_value is signed (10-byte varint must mask back), and the
    encoder must not conflate True == 1 == 1.0 when deduping values."""
    # hand-craft a Value message with field 4 (int_value) = -5
    buf = bytearray()
    buf.append((4 << 3) | 0)
    mvt._write_varint(buf, (1 << 64) - 5)  # two's-complement varint of -5
    assert mvt._decode_value(bytes(buf)) == -5
    # mixed-type property values survive a round-trip with correct types
    z, x, y = TILE
    layers = {"pages": [
        {"geom_type": 1, "parts": [[(1, 1)]],
         "props": {"a": True, "b": 1, "c": 1.0, "d": -7}, "id": 1},
    ]}
    props = mvt.decode_tile(mvt.encode_tile(layers), x, y, z)[0]["properties"]
    assert props["a"] is True
    assert props["b"] == 1 and not isinstance(props["b"], bool)
    assert isinstance(props["c"], float)
    assert props["d"] == -7


def test_quantization_matches_cell_assignment():
    """lonlat -> extent int -> lonlat stays inside the same z-cell (the
    lossy MVT step must never move a point across its tile)."""
    z, x, y = TILE
    w, s, e, n = (float(v) for v in tm.tile_to_bbox(x, y, z))
    rng = np.random.RandomState(7)
    lon = rng.uniform(w, e, 200)
    lat = rng.uniform(s, n, 200)
    px, py = mvt.lonlat_to_extent(lon, lat, x, y, z)
    assert px.min() >= 0 and px.max() <= 4095
    lon2 = tm.tile_to_lon(x + px / 4096.0, z)
    lat2 = tm.tile_to_lat(y + py / 4096.0, z)
    x2, y2 = tm.point_to_tile(lon2, lat2, z)
    assert (x2 == x).all() and (y2 == y).all()


def test_mbtiles_roundtrip_and_info(tmp_path):
    path = str(tmp_path / "t.mbtiles")
    z, x, y = TILE
    blob = mvt.encode_tile(_point_layer())
    mvt.write_mbtiles(path, [(z, x, y, blob), (z, x + 1, y, blob)],
                      metadata={"name": "fix", "format": "pbf"})
    info = mvt.mbtiles_info(path)
    assert info["minzoom"] == z and info["maxzoom"] == z
    assert info["tile_count"] == 2 and info["metadata"]["format"] == "pbf"


def test_distributed_decode(spark, tmp_path):
    """MBTiles -> DataFrame -> mapInPandas decode: per-tile rows come back
    with the TMS flip undone and features intact."""
    path = str(tmp_path / "d.mbtiles")
    z = 6
    tiles = []
    for i in range(4):
        layers = {"pages": [
            {"geom_type": 1, "parts": [[(64 * j + i, 128)]],
             "props": {"n": j}, "id": j} for j in range(3)
        ]}
        tiles.append((z, 30 + i, 20 + i, mvt.encode_tile(layers)))
    mvt.write_mbtiles(path, tiles)

    df = mvt.read_mbtiles(spark, path)
    assert df.count() == 4
    feats = mvt.decode_tiles_df(df)
    rows = feats.collect()
    assert len(rows) == 12
    assert {(r.x, r.y) for r in rows} == {(30 + i, 20 + i) for i in range(4)}
    r0 = [r for r in rows if r.x == 30 and r.feature_id == 0][0]
    assert r0.layer == "pages" and r0.geom_type == "Point"
    assert json.loads(r0.props_json) == {"n": 0}
    lon = json.loads(r0.geometry_json)["coordinates"][0]
    assert abs(lon - float(tm.tile_to_lon(30 + 0 / 4096.0, z))) < 1e-9


def test_cells_to_mvt_sink_roundtrip(spark, tmp_path):
    """Write side: cells -> per-tile MVT blobs (applyInPandas) -> MBTiles
    file -> re-ingest reconstructs ids, properties and integer-exact
    geometry."""
    cells = spark.createDataFrame(
        [(40, 41, 7, 2.5), (41, 41, 3, 0.5), (44, 40, 1, 9.0)],
        "x long, y long, cnt long, w double")
    tiles = mvt.cells_to_mvt_tiles(cells, cell_z=10, k=2, layer="g",
                                   props=["cnt", "w"])
    rows = tiles.collect()
    assert {(r.z, r.x, r.y) for r in rows} == {(8, 10, 10), (8, 11, 10)}

    path = str(tmp_path / "sink.mbtiles")
    n = mvt.write_mbtiles_df(tiles, path)
    assert n == 2
    feats = mvt.decode_tiles_df(mvt.read_mbtiles(spark, path)).collect()
    assert len(feats) == 3
    got = {}
    for r in feats:
        cx, cy = r.feature_id % 4, r.feature_id // 4
        props = json.loads(r.props_json)
        got[(r.x * 4 + cx, r.y * 4 + cy)] = (props["cnt"], props["w"])
        g = json.loads(r.geometry_json)
        assert g["type"] == "Polygon" and len(g["coordinates"][0]) == 5
    assert got == {(40, 41): (7, 2.5), (41, 41): (3, 0.5), (44, 40): (1, 9.0)}
    # geometry is integer-exact: the cell's sw corner quantizes back to
    # exactly the cell
    for r in feats:
        ring = json.loads(r.geometry_json)["coordinates"][0]
        lon, lat = ring[0]
        cx, cy = r.feature_id % 4, r.feature_id // 4
        fx, fy = tm.point_to_tile_fraction(lon, lat, 10)
        assert round(float(fx), 6) == r.x * 4 + cx
        assert round(float(fy), 6) == r.y * 4 + cy


def test_generic_feature_sink_roundtrip(spark):
    """decode -> features_to_mvt_tiles -> decode is exact after the first
    quantization (extent ints -> lon/lat -> extent ints is lossless), for
    every geometry family including holes and multi-parts — the
    MBTiles -> transform -> MBTiles pipeline shape."""
    z, x, y = TILE
    ext1 = [(10, 10), (500, 10), (500, 500), (10, 500), (10, 10)]
    hole = [(100, 100), (100, 200), (200, 200), (200, 100), (100, 100)]
    ext2 = [(1000, 1000), (2000, 1000), (2000, 2000), (1000, 2000), (1000, 1000)]
    layers = {
        "pts": [
            {"geom_type": 1, "parts": [[(100, 200)]], "props": {"n": 1}, "id": 1},
            {"geom_type": 1, "parts": [[(7, 8)], [(2000, 3000)]],
             "props": {"m": True}, "id": 2},
        ],
        "lines": [
            {"geom_type": 2, "parts": [[(0, 0), (50, 80), (90, 80)]],
             "props": {"km": 1.5}, "id": 3},
            {"geom_type": 2, "parts": [[(5, 5), (9, 9)], [(11, 11), (20, 5)]],
             "props": {}, "id": 4},
        ],
        "polys": [
            {"geom_type": 3, "parts": [ext1, hole, ext2], "props": {"a": -2},
             "id": 5},
        ],
    }
    tiles1 = spark.createDataFrame(
        [(z, x, y, mvt.encode_tile(layers))], "z int, x long, y long, data binary")
    feats1 = mvt.decode_tiles_df(tiles1)
    tiles2 = mvt.features_to_mvt_tiles(feats1)
    feats2 = mvt.decode_tiles_df(tiles2)

    def key(rows):
        return sorted((r.z, r.x, r.y, r.layer, r.feature_id, r.geom_type,
                       r.geometry_json, r.props_json) for r in rows)

    a, b = key(feats1.collect()), key(feats2.collect())
    assert len(a) == 5
    assert a == b
    types = {r.feature_id: r.geom_type for r in feats2.collect()}
    assert types == {1: "Point", 2: "MultiPoint", 3: "LineString",
                     4: "MultiLineString", 5: "MultiPolygon"}


def test_decode_plan_is_narrow(spark, tmp_path):
    from tests.test_physical_plans import plan_str

    path = str(tmp_path / "n.mbtiles")
    blob = mvt.encode_tile(_point_layer())
    mvt.write_mbtiles(path, [(6, 32, 25, blob)])
    feats = mvt.decode_tiles_df(mvt.read_mbtiles(spark, path))
    p = plan_str(feats)
    assert "Exchange" not in p  # per-tile decode: no shuffle
