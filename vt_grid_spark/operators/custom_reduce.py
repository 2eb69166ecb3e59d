"""Custom per-cell reducers — the reference's user-plugin surface
(arbitrary ``(memo, feature, areaOfIntersection, tile) -> memo`` closures
loaded per worker, /root/reference/lib/aggregate.js:26-36, exercised by
test/lib/aggregate-cells.js:13,41 and bench/aggregations/osm-roads.js:7-15).

Spark form: a Python callable ``reduce_fn(pdf: pandas.DataFrame, tile:
tuple) -> dict`` applied per cell group via applyInPandas — Arrow-batched,
never row-at-a-time (north_rule: no per-row Python).  The ``tile``
argument (the mapper tile the reference passes through, aggregate-cells
.js:92) is reconstructed from the cell key so reducer code can keep the
reference's calling convention.

Scale note (SURVEY.md §7 g7): applyInPandas materializes one cell's rows
in one worker — pre-aggregate or salt upstream if cells can exceed memory;
algebraic logic belongs in plans/aggspec instead.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame


def apply_custom_reducer(encoded: DataFrame, cell_z: int, mapper_z: int,
                         reduce_fn: Callable[[pd.DataFrame, tuple], dict],
                         result_schema: str) -> DataFrame:
    """encoded: rows with (x, y) cell columns at cell_z + value columns.

    reduce_fn sees all rows of one cell and the (z, x, y) of the *mapper*
    tile containing that cell at mapper_z (the reference's tile arg).
    Returns one dict of result columns per cell; output schema is
    ``x long, y long, <result_schema>``.
    """
    dz = cell_z - mapper_z

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = int(key[0]), int(key[1])
        tile = (mapper_z, x >> dz, y >> dz)  # (z, x, y) — single convention
        res = reduce_fn(pdf, tile)
        return pd.DataFrame([{"x": x, "y": y, **res}])

    return encoded.groupBy("x", "y").applyInPandas(
        per_cell, schema=f"x long, y long, {result_schema}")
