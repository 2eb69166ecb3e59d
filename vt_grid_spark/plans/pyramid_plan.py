"""Pyramid build plan: zoom bands with per-band aggregation specs.

Mirrors the reference's option-stack semantics (array of option objects
sorted by basezoom desc with band continuity ``basezoom[i] == minzoom[i-1]``,
/root/reference/index.js:45-59) as a typed plan validated up front.
"""

from __future__ import annotations

from dataclasses import dataclass

from vt_grid_spark.plans.aggspec import AggSpec
from vt_grid_spark.tilemath import grid_zoom


@dataclass
class ZoomBand:
    """Aggregations to apply for output levels in (minzoom .. basezoom-1]."""

    basezoom: int
    minzoom: int
    aggregations: list[AggSpec]

    def __post_init__(self):
        if self.minzoom >= self.basezoom:
            raise ValueError("minzoom must be < basezoom")


@dataclass
class PyramidPlan:
    """bands sorted by basezoom desc; gridsize = cells per output tile (4^d).

    levels() yields (output_zoom, cell_zoom, band) from base-1 down to the
    final minzoom — the reference's driver recursion
    (/root/reference/index.js:151-159) flattened into a list.
    """

    bands: list[ZoomBand]
    gridsize: int = 1024
    salt_buckets: int = 16
    # re-salt rule (SURVEY.md §7 g5): a rollup with holistic reducers runs
    # the two-phase salted aggregation only while the previous level's
    # manifest max_cell_rows (max per-cell point count) exceeds this —
    # upper pyramid levels whose cells are cold skip the extra shuffle
    hot_key_threshold: int = 2_000_000
    layer: str = "layer"
    # cover restriction (reference index.js:113-122): build only over the
    # cells intersecting `bbox` (w, s, e, n) and/or the progeny of explicit
    # `tiles` [(z, x, y), ...]; None + None = sourceCover (all data)
    bbox: tuple | None = None
    tiles: list | None = None

    def __post_init__(self):
        self.bands = sorted(self.bands, key=lambda b: -b.basezoom)
        for prev, nxt in zip(self.bands, self.bands[1:]):
            if nxt.basezoom != prev.minzoom:
                raise ValueError(
                    f"zoom band gap/overlap: band ending at minzoom {prev.minzoom} "
                    f"followed by band starting at basezoom {nxt.basezoom} "
                    "(reference validates the same, index.js:55-59)")
        grid_zoom(0, self.gridsize)  # validates power-of-4

    @property
    def basezoom(self) -> int:
        return self.bands[0].basezoom

    @property
    def minzoom(self) -> int:
        return self.bands[-1].minzoom

    def levels(self):
        for band in self.bands:
            for z in range(band.basezoom - 1, band.minzoom - 1, -1):
                yield z, grid_zoom(z, self.gridsize), band
