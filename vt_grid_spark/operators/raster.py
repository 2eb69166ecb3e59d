"""Raster <-> vector-cell conversion (north_rule operator).

A raster block is one tile-aligned grid: (tile_z, tile_x, tile_y,
band array<double>) with a 2^k x 2^k band in row-major order (FIXTURES.md
F5 uses 256x256, k=8).  Pixel (row, col) of block (tz, tx, ty) IS cell
(tx*2^k + col, ty*2^k + row) at zoom tz + k — raster->vector is pure
integer arithmetic on the exploded array index, fully JVM-side
(posexplode + bit math, no Python), and vector->raster is its inverse
group-by with a dense-array assembly.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def raster_to_cells(blocks: DataFrame, k: int = 8, band: str = "band",
                    drop_zero: bool = True) -> DataFrame:
    """blocks(tile_z, tile_x, tile_y, band[4^k row-major]) -> cell rows
    (zoom, x, y, value) at zoom = tile_z + k.

    posexplode keeps the whole transform in whole-stage codegen; the sum
    of values is conserved exactly (Σ band == Σ cell values per block).
    drop_zero mirrors the engine's sparse-cells convention.
    """
    side = 1 << k
    exploded = blocks.select(
        "tile_z", "tile_x", "tile_y",
        F.posexplode(band).alias("pos", "value"),
    )
    cells = exploded.select(
        (F.col("tile_z") + k).alias("zoom"),
        (F.shiftleft("tile_x", k) + F.col("pos") % side).alias("x"),
        (F.shiftleft("tile_y", k) + (F.col("pos") / side).cast("long")).alias("y"),
        F.col("value"),
    )
    if drop_zero:
        cells = cells.where(F.col("value") != 0.0)
    return cells


def cells_to_raster(cells: DataFrame, k: int = 8, value: str = "value",
                    fill: float = 0.0) -> DataFrame:
    """Inverse: cell rows at zoom z -> dense blocks at tile zoom z - k.

    Dense assembly via aggregate over (pos -> value) pairs: build a
    map from pixel index to value per block, then project the 4^k-long
    array — still no Python.  Missing pixels take ``fill``.
    """
    side = 1 << k
    npix = side * side
    keyed = cells.select(
        (F.col("zoom") - k).alias("tile_z"),
        F.shiftright("x", k).alias("tile_x"),
        F.shiftright("y", k).alias("tile_y"),
        ((F.col("y") % side) * side + (F.col("x") % side)).cast("int").alias("pos"),
        F.col(value).alias("_v"),
    )
    agg = keyed.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.map_from_entries(F.collect_list(F.struct("pos", "_v"))).alias("_m")
    )
    # dense array: element i = map[i] or fill
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(npix - 1)),
        lambda i: F.coalesce(F.element_at("_m", i), F.lit(fill)),
    )
    return agg.select("tile_z", "tile_x", "tile_y", dense.alias("band"))
