"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full pyramid build over the synthetic page
                 corpus at sf0.001 scale (geotag -> encode -> rollup).
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query (same parquet views +
                 the deterministic pages CTE, byte-identical in both
                 engines — tests/test_corpus.py proves it).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vt_grid_spark.queries import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geotag the page corpus, build the full tile pyramid
    (base cell zoom 12 -> 4), return the unioned levels."""
    from pyspark.sql import functions as F

    from vt_grid_spark.operators.pyramid import build_pyramid_df
    from vt_grid_spark.plans.aggspec import AggSpec
    from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand
    from vt_grid_spark.sources import pages

    pts = pages.with_coords(pages.pages_df(spark, 5_000))
    pts = pts.withColumn("v", F.length("text").cast("double"))
    plan = PyramidPlan(
        bands=[ZoomBand(basezoom=11, minzoom=3,
                        aggregations=[
                            AggSpec(out="cnt", reducer="count"),
                            AggSpec(out="sum_v", reducer="sum", field="v"),
                        ])],
        gridsize=16, salt_buckets=8,
    )
    return build_pyramid_df(pts, plan)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
