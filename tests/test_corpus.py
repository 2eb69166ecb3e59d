"""Synthetic page corpus: Spark and DuckDB generators must agree byte-for-byte
(they are the two sides of every oracle check)."""

import duckdb

from vt_grid_spark.sources import pages


def test_pages_spark_duckdb_identical(spark):
    n = 2000
    sdf = pages.pages_df(spark, n).select("url", "text", "lang").orderBy("url")
    srows = [(r.url, r.text, r.lang) for r in sdf.collect()]
    drows = duckdb.sql(
        f"SELECT url, text, lang FROM ({pages.pages_cte_sql(n)}) ORDER BY url"
    ).fetchall()
    assert srows == drows


def test_pages_layout_rules(spark):
    n = 2000
    df = pages.pages_df(spark, n)
    rows = df.collect()
    assert len(rows) == n
    no_geo = [r for r in rows if " geo:" not in r.text]
    assert len(no_geo) == n // 20  # i % 20 == 3
    double = [r for r in rows if r.text.count(" geo:") == 2]
    assert len(double) == len([i for i in range(n) if i % 100 == 7 and i % 20 != 3])
    # html wraps text exactly (extractor invariant input)
    r0 = rows[0]
    assert bytes(r0.html) == b"<html><body>" + r0.text.encode() + b"</body></html>"


def test_with_coords_first_token_wins(spark):
    n = 1000
    df = pages.with_coords(pages.pages_df(spark, n))
    rows = {r.url: r for r in df.collect()}
    # row 7: i%100==7 -> two geo tokens; first (the real one) wins
    r7 = rows["https://site7.example/page/7"]
    assert abs(r7.lat - ((7 * 2654435761) % 170_000_000 - 85_000_000) / 1e6) < 1e-12
    # row 3: no geo -> dropped
    assert "https://site3.example/page/3" not in rows
    # hot rows (i%5==0) inside the z8 skew tile (x=75, y=96)
    from vt_grid_spark import tilemath as tm
    r10 = rows["https://site10.example/page/10"]
    x, y = tm.point_to_tile(r10.lon, r10.lat, 8)
    assert (int(x), int(y)) == (75, 96)


def test_with_coords_sql_matches(spark):
    n = 1000
    sdf = pages.with_coords(pages.pages_df(spark, n)).select("url", "lon", "lat").orderBy("url")
    srows = [(r.url, r.lon, r.lat) for r in sdf.collect()]
    drows = duckdb.sql(
        f"SELECT url, lon, lat FROM ({pages.with_coords_sql(pages.pages_cte_sql(n))}) ORDER BY url"
    ).fetchall()
    assert srows == drows
