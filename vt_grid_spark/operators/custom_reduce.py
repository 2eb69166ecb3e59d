"""Custom per-cell reducers — the reference's user-plugin surface
(arbitrary ``(memo, feature, areaOfIntersection, tile) -> memo`` closures
loaded per worker, /root/reference/lib/aggregate.js:26-36, exercised by
test/lib/aggregate-cells.js:13,41 and bench/aggregations/osm-roads.js:7-15).

Spark form: a Python callable ``reduce_fn(pdf: pandas.DataFrame, tile:
tuple) -> dict`` applied per cell group — Arrow-batched, never
row-at-a-time (north_rule: no per-row Python).  The ``tile`` argument
(the mapper tile the reference passes through, aggregate-cells.js:92) is
reconstructed from the cell key so reducer code can keep the reference's
calling convention.

Two physical strategies, identical semantics:

  * ``batched`` (default) — repartition on the cell key, sort within
    partitions, then ONE mapInPandas pass that sub-groups each Arrow
    batch in pandas, carrying the trailing (possibly batch-spanning)
    cell into the next batch.  groupBy().applyInPandas pays ~ms of
    per-GROUP machinery; at one group per cell that overhead IS the
    operator's cost at scale (millions of cells), the same pathology the
    MVT sink hit (sources/mvt.py).
  * ``per_cell`` — the plain applyInPandas form; right when cells are
    few and huge.

Scale note (SURVEY.md §7 g7): either way one cell's rows materialize in
one worker — pre-aggregate or salt upstream if cells can exceed memory;
algebraic logic belongs in plans/aggspec instead.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_custom_reducer(encoded: DataFrame, cell_z: int, mapper_z: int,
                         reduce_fn: Callable[[pd.DataFrame, tuple], dict],
                         result_schema: str,
                         strategy: str = "batched") -> DataFrame:
    """encoded: rows with (x, y) cell columns at cell_z + value columns.

    reduce_fn sees all rows of one cell and the (z, x, y) of the *mapper*
    tile containing that cell at mapper_z (the reference's tile arg).
    Returns one dict of result columns per cell; output schema is
    ``x long, y long, <result_schema>``.
    """
    dz = cell_z - mapper_z
    out_schema = f"x long, y long, {result_schema}"

    if strategy == "per_cell":
        def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
            x, y = int(key[0]), int(key[1])
            tile = (mapper_z, x >> dz, y >> dz)  # (z, x, y) single convention
            res = reduce_fn(pdf, tile)
            return pd.DataFrame([{"x": x, "y": y, **res}])

        return encoded.groupBy("x", "y").applyInPandas(
            per_cell, schema=out_schema)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (x, y), g in pdf.groupby(["x", "y"], sort=False):
            tile = (mapper_z, int(x) >> dz, int(y) >> dz)
            rows.append({"x": int(x), "y": int(y),
                         **reduce_fn(g.reset_index(drop=True), tile)})
        return pd.DataFrame(rows)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # rows arrive sorted by (x, y) within the partition, so only
            # the LAST cell of a batch can continue into the next batch
            lx, ly = pdf["x"].iloc[-1], pdf["y"].iloc[-1]
            tail = (pdf["x"] == lx) & (pdf["y"] == ly)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield process(body)
        if carry is not None and len(carry):
            yield process(carry)

    parts = (encoded.repartition("x", "y")
             .sortWithinPartitions("x", "y"))
    return parts.mapInPandas(gen, schema=out_schema)
