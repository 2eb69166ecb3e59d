"""Streaming == batch equivalence; custom reducer calling convention."""

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_equals_batch(spark, tmp_path):
    import shutil

    from vt_grid_spark.streaming.events import (run_stream_from_parquet,
                                                windowed_cell_counts)

    batch = spark.read.parquet(f"{SF}/events.parquet")
    want = {(str(r.window_start), r.x, r.y, r.cnt, r.sum_value)
            for r in windowed_cell_counts(batch).collect()}

    # streaming file source needs a directory
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    run_stream_from_parquet(spark, str(src_dir), batch.schema, "stream_cells")
    got = {(str(r.window_start), r.x, r.y, r.cnt, r.sum_value)
           for r in spark.sql("SELECT * FROM stream_cells").collect()}
    assert got == want
    assert len(want) > 100


def test_custom_reducer_tile_passthrough(spark):
    """Mirror of the reference's custom 'tile' reducer check
    (/root/reference/test/lib/aggregate-cells.js:13,24-25: the mapper tile
    reaches the reducer as its 4th argument)."""
    from vt_grid_spark.operators.custom_reduce import apply_custom_reducer
    from vt_grid_spark.operators.encode import encode_points
    from vt_grid_spark.sources import pages

    pts = pages.with_coords(pages.pages_df(spark, 500))
    enc = encode_points(pts, 10, with_quadkey=False)

    def reducer(pdf: pd.DataFrame, tile) -> dict:
        # reference convention: memo starts falsy, first call stamps the tile
        return {"n": len(pdf), "tile": ",".join(str(t) for t in tile)}

    out = apply_custom_reducer(enc, cell_z=10, mapper_z=5, reduce_fn=reducer,
                               result_schema="n long, tile string").collect()
    assert sum(r.n for r in out) == pts.count()
    for r in out:
        z, tx, ty = (int(v) for v in r.tile.split(","))
        assert (z, tx, ty) == (5, r.x >> 5, r.y >> 5)


def test_post_aggregations(spark):
    """postAggregations semantics (/root/reference/lib/aggregate-cells.js:96-101,
    README.md:109-117): per-cell scalar derived after aggregation — e.g.
    unique_count = size(union array)."""
    from vt_grid_spark.operators.encode import cell_aggregate, encode_points
    from vt_grid_spark.plans.aggspec import AggSpec, compile_aggs
    from vt_grid_spark.sources import pages

    pts = pages.with_coords(pages.pages_df(spark, 1000))
    enc = encode_points(pts, 4, with_quadkey=False)
    cells = cell_aggregate(enc, 4, compile_aggs([AggSpec(out="langs", reducer="union", field="lang")]))
    out = cells.withColumn("unique_count", F.size("langs").cast("long")).collect()
    for r in out:
        assert r.unique_count == len(set(r.langs))
