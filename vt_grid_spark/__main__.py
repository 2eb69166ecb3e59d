"""CLI entry point mirroring the reference's ``bin/vt-grid`` surface
(/root/reference/bin/vt-grid:7-25 flag-for-flag where semantics carry):

    python -m vt_grid_spark INPUT -o OUTPUT \
        [--minzoom 1] [--basezoom Z] [--gridsize 1024] [--jobs N] \
        --aggregations 'layer:func(field)' [...] [--bbox W S E N] \
        [--tiles z,x,y ...] [--resume] [--quiet] [--export-mbtiles K]

INPUT is a parquet/directory of points with (lon, lat, ...) columns, or an
.mbtiles file (ingested through the true MVT decode path; point features
become rows).  OUTPUT is a TableIO root (zoom-partitioned parquet +
manifests — the engine's native artifact); ``--export-mbtiles K`` also
packs each written level's cells into MVT tiles (2^K x 2^K cells per
tile) and writes OUTPUT/grid.mbtiles, the reference's output artifact.

Differences from the reference, by design (README "Migrating from
vt-grid"): --jobs maps to local[N] Spark parallelism (on a cluster,
spark-submit owns parallelism and --jobs is ignored); js module
aggregations/postAggregations become Python callables on the library API
(operators.custom_reduce) — a .js argument is rejected with that hint.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m vt_grid_spark",
        description="Build a tile pyramid of aggregate grid cells.")
    p.add_argument("input", help="points parquet path OR input .mbtiles")
    p.add_argument("-o", "--output", required=True,
                   help="output TableIO root directory")
    p.add_argument("--aggregations", nargs="+", required=True,
                   help="'layer:func(field)' strings (reference bin/vt-grid:33)")
    p.add_argument("--minzoom", type=int, default=1)
    p.add_argument("--basezoom", type=int, default=None,
                   help="base OUTPUT zoom; defaults to input maxzoom for "
                        "mbtiles input (reference index.js:75-86)")
    p.add_argument("--gridsize", type=int, default=1024,
                   help="grid cells per tile; power of 4")
    p.add_argument("--jobs", type=int, default=None,
                   help="local[N] cores (ignored under spark-submit)")
    p.add_argument("--layer", default=None,
                   help="input layer to read from an mbtiles input")
    p.add_argument("--bbox", type=float, nargs=4, metavar=("W", "S", "E", "N"))
    p.add_argument("--tiles", nargs="+", default=None, metavar="z,x,y",
                   help="restrict the build to these tiles' cover")
    p.add_argument("--resume", action="store_true",
                   help="skip zoom levels whose manifest is complete")
    p.add_argument("--export-mbtiles", type=int, default=None, metavar="K",
                   help="also write OUTPUT/grid.mbtiles with 2^K x 2^K "
                        "cells per tile")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if any(a.endswith(".js") for a in args.aggregations):
        print("js aggregation modules are a Node surface; pass "
              "'layer:func(field)' strings here and use Python callables "
              "via operators.custom_reduce for custom reducers (README: "
              "Migrating from vt-grid)", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from vt_grid_spark.plans.aggspec import parse_agg_strings
    from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
    from vt_grid_spark.operators.pyramid import build_pyramid
    from vt_grid_spark.session import get_spark
    from vt_grid_spark.sources.table_io import TableIO

    per_layer = parse_agg_strings(args.aggregations)
    if len(per_layer) != 1:
        print("one input layer per build (run one build per layer, same "
              "output root)", file=sys.stderr)
        return 2
    layer, specs = next(iter(per_layer.items()))

    spark = get_spark("vt-grid", cores=args.jobs)
    if args.input.endswith(".mbtiles"):
        from vt_grid_spark.sources import mvt

        info = mbinfo = mvt.mbtiles_info(args.input)
        basezoom = args.basezoom if args.basezoom is not None else info["maxzoom"]
        feats = mvt.decode_tiles_df(
            mvt.read_mbtiles(spark, args.input, zoom=basezoom))
        if args.layer:
            feats = feats.where(F.col("layer") == args.layer)
        pts = feats.where(F.col("geom_type") == "Point").select(
            F.get_json_object("geometry_json", "$.coordinates[0]")
            .cast("double").alias("lon"),
            F.get_json_object("geometry_json", "$.coordinates[1]")
            .cast("double").alias("lat"),
            *[F.get_json_object("props_json", f"$.{s.field}")
              .cast("double").alias(s.field)
              for s in specs if s.field],
        )
        if not args.quiet:
            print(f"mbtiles input: {json.dumps(mbinfo['metadata'])} "
                  f"z{info['minzoom']}-{info['maxzoom']}", file=sys.stderr)
    else:
        if args.basezoom is None:
            print("--basezoom is required for parquet input", file=sys.stderr)
            return 2
        basezoom = args.basezoom
        pts = spark.read.parquet(args.input)

    tiles = None
    if args.tiles:
        tiles = [tuple(int(v) for v in t.split(",")) for t in args.tiles]
    plan = PyramidPlan(
        bands=[ZoomBand(basezoom=basezoom, minzoom=args.minzoom,
                        aggregations=specs)],
        gridsize=args.gridsize,
        bbox=tuple(args.bbox) if args.bbox else None,
        tiles=tiles)

    io = TableIO(args.output)
    manifests = build_pyramid(pts, plan, io, resume=args.resume)
    if not args.quiet:
        for z in sorted(manifests, reverse=True):
            m = manifests[z]
            print(f"zoom={z} rows={m['row_count']} status={m['status']}",
                  file=sys.stderr)

    if args.export_mbtiles is not None:
        from vt_grid_spark.sources import mvt

        k = args.export_mbtiles
        tiles_out = []
        prop_cols = None
        for z in sorted(manifests, reverse=True):
            cells = io.read_level(spark, z)
            if prop_cols is None:
                prop_cols = [c for c in cells.columns
                             if c not in {"zoom", "x", "y", "quadkey"}]
            tiles_out.append(mvt.cells_to_mvt_tiles(
                cells, cell_z=z, k=k, layer=layer, props=prop_cols))
        blobs = tiles_out[0]
        for t in tiles_out[1:]:
            blobs = blobs.unionByName(t)
        n = mvt.write_mbtiles_df(blobs, f"{args.output}/grid.mbtiles")
        if not args.quiet:
            print(f"grid.mbtiles: {n} tiles", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
