"""Pure-SQL surface (functions/sqlfuncs.py): the vt_* SQL scalar
functions must agree exactly with the Column builders / tilemath, so an
all-SQL pipeline is a drop-in for the DataFrame API."""

from pyspark.sql import functions as F

from vt_grid_spark import functions as vf
from vt_grid_spark import tilemath as tm
from vt_grid_spark.functions.sqlfuncs import register_sql_functions
from vt_grid_spark.sources import pages


def test_sql_functions_match_column_builders(spark):
    register_sql_functions(spark)
    pts = pages.with_coords(pages.pages_df(spark, 500))
    pts.createOrReplaceTempView("_sqlf_pts")
    for z in (3, 7, 12):
        got = spark.sql(f"""
            SELECT url, vt_tile_x(lon, {z}) AS sx, vt_tile_y(lat, {z}) AS sy,
                   vt_quadkey(vt_tile_x(lon, {z}), vt_tile_y(lat, {z}), {z}) AS sqk
            FROM _sqlf_pts""")
        want = pts.select(
            "url", vf.tile_x(F.col("lon"), z).alias("x"),
            vf.tile_y(F.col("lat"), z).alias("y")).withColumn(
            "qk", vf.quadkey(F.col("x"), F.col("y"), z))
        j = got.join(want, "url")
        assert j.where((F.col("sx") != F.col("x"))
                       | (F.col("sy") != F.col("y"))
                       | (F.col("sqk") != F.col("qk"))).count() == 0
        assert j.count() == pts.count()


def test_sql_quadkey_roundtrip_and_lineage(spark):
    register_sql_functions(spark)
    rows = spark.sql("""
        WITH t AS (SELECT id AS x, (id * 7) % 128 AS y FROM range(0, 128)),
        q AS (SELECT x, y, vt_quadkey(x, y, 7) AS qk FROM t)
        SELECT x, y, qk, vt_quadkey_x(qk) AS rx, vt_quadkey_y(qk) AS ry,
               vt_parent_x(x) AS px, vt_parent_y(y) AS py,
               vt_is_ancestor(x, y, 7, shiftright(x, 3), shiftright(y, 3), 4) AS anc,
               vt_is_ancestor(x, y, 7, shiftright(x, 3) + 1, shiftright(y, 3), 4) AS not_anc
        FROM q""").collect()
    assert len(rows) == 128
    for r in rows:
        assert (r.rx, r.ry) == (r.x, r.y)                 # quadkey inverts
        assert r.qk == tm.tile_to_quadkey(r.x, r.y, 7)    # numpy twin
        assert (r.px, r.py) == tm.parent(r.x, r.y, 7)[:2]
        assert r.anc and not r.not_anc
    # z=0 root tile: '' quadkey (sequence(1,0) is DESCENDING in Spark —
    # the guard must short-circuit), and the inverse maps '' -> (0, 0)
    root = spark.sql("SELECT vt_quadkey(0, 0, 0) AS qk, "
                     "vt_quadkey_x('') AS x, vt_quadkey_y('') AS y").collect()[0]
    assert (root.qk, root.x, root.y) == ("", 0, 0)


def test_sql_cell_pack_exact_at_high_zoom(spark):
    """vt_cell_x/vt_cell_y must decode with integer bit math — packed ids
    exceed 2^53 at z=28, where double division silently corrupts y."""
    register_sql_functions(spark)
    z, n = 28, 1 << 28
    rows = spark.sql(f"""
        WITH t AS (SELECT id * 76543217 % {n} AS x, (id * 1234577) % {n} AS y
                   FROM range(0, 500))
        SELECT x, y, vt_cell_id(x, y, {z}) AS cell,
               vt_cell_x(vt_cell_id(x, y, {z}), {z}) AS rx,
               vt_cell_y(vt_cell_id(x, y, {z}), {z}) AS ry
        FROM t""").collect()
    assert max(r.cell for r in rows) > (1 << 53)
    for r in rows:
        assert (r.rx, r.ry) == (r.x, r.y)


def test_sql_pipeline_equals_dataframe_pipeline(spark):
    """A whole encode+rollup written in spark.sql matches the DataFrame
    pyramid path cell-for-cell."""
    from vt_grid_spark.operators.encode import cell_aggregate, encode_points

    register_sql_functions(spark)
    pts = pages.with_coords(pages.pages_df(spark, 1000)) \
        .withColumn("v", F.length("text").cast("double"))
    pts.createOrReplaceTempView("_sqlf_pipe")
    sql_cells = spark.sql("""
        SELECT vt_parent_x(x) AS x, vt_parent_y(y) AS y,
               SUM(cnt) AS cnt, SUM(sum_v) AS sum_v
        FROM (
          SELECT vt_tile_x(lon, 8) AS x, vt_tile_y(lat, 8) AS y,
                 COUNT(*) AS cnt, SUM(v) AS sum_v
          FROM _sqlf_pipe GROUP BY 1, 2
        ) GROUP BY 1, 2""")
    df_cells = cell_aggregate(
        encode_points(pts, 8, with_quadkey=False), 8,
        [F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v")]) \
        .groupBy(F.shiftright("x", 1).alias("x"),
                 F.shiftright("y", 1).alias("y")) \
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum_v").alias("sum_v"))
    a = {(r.x, r.y): (r.cnt, r.sum_v) for r in sql_cells.collect()}
    b = {(r.x, r.y): (r.cnt, r.sum_v) for r in df_cells.collect()}
    assert a == b and len(a) > 10
