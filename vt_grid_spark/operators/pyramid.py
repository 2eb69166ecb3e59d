"""Pyramid driver: the reference's per-level recursion
(/root/reference/index.js:94-162) as a checkpointed Spark loop.

Each output level is one shuffle stage (groupBy on the integer parent
key); every level is written to a ``zoom=<z>`` partition with a manifest
(the resume point, mirroring the reference feeding each level's mbtiles
into the next, index.js:151-159).  Within a run the next rollup reads the
previous level from the block-manager CACHE (persisted during the level's
own write job), not back off parquet — the checkpoint write is the
durability path, never a serial decode on the critical path.  On resume
the cache is cold and the level IS re-read from its checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vt_grid_spark import tilemath as tm
from vt_grid_spark.operators.encode import (cell_aggregate, cover_cell_predicate,
                                            cover_lonlat_predicate, cover_ranges,
                                            encode_points)
from vt_grid_spark.operators.rollup import HOLISTIC, merge_cells, rollup_level
from vt_grid_spark.plans.aggspec import AggSpec, compile_aggs
from vt_grid_spark.plans.pyramid_plan import PyramidPlan
from vt_grid_spark.sources.table_io import TableIO

# below this many rows a level is rolled up driver-side (pandas groupby):
# at the top of the pyramid each level is one near-empty Spark job (~0.5-2 s
# of pure scheduling), and 10+ such levels are the serial fraction that
# caps scaling efficiency.  100k rows of partials is a few MB.
SMALL_LEVEL_ROWS = 1_000_000


def _rollup_small_pandas(pdf, child_z: int, specs: list[AggSpec]):
    """Driver-side rollup of one tiny level — same semantics as
    compile_rollup_aggs, exact (integer/partial sums)."""
    import pandas as pd

    z = child_z - 1
    pdf = pdf.copy()
    pdf["x"] = pdf["x"] // 2
    pdf["y"] = pdf["y"] // 2
    aggs: dict = {}
    for s in specs:
        if s.reducer in ("count", "sum", "areaWeightedSum", "totalArea"):
            aggs[s.out] = (s.out, "sum")
        elif s.reducer == "min":
            aggs[s.out] = (s.out, "min")
        elif s.reducer == "max":
            aggs[s.out] = (s.out, "max")
        elif s.reducer == "mean":
            aggs[f"{s.out}__cnt"] = (f"{s.out}__cnt", "sum")
            aggs[f"{s.out}__sum"] = (f"{s.out}__sum", "sum")
        elif s.reducer == "areaWeightedMean":
            aggs[f"{s.out}__w"] = (f"{s.out}__w", "sum")
            aggs[f"{s.out}__wv"] = (f"{s.out}__wv", "sum")
        elif s.reducer == "union":
            aggs[s.out] = (s.out, lambda col: sorted({v for arr in col for v in arr}))
        elif s.reducer == "kmvDistinct":
            # k smallest of the union of the children's k-smallest — same
            # exact-merge rule as compile_rollup_aggs
            aggs[s.out] = (s.out, lambda col, k=s.k:
                           sorted({v for arr in col for v in arr})[:k])
        elif s.reducer == "histQuantile":
            # elementwise sum of the bucket arrays — same exact merge as
            # compile_rollup_aggs
            aggs[s.out] = (s.out, lambda col, b=s.buckets:
                           [int(sum(arr[i] for arr in col))
                            for i in range(b)])
    out = pdf.groupby(["x", "y"], as_index=False).agg(**aggs)
    out.insert(0, "zoom", z)
    out.insert(3, "quadkey", tm.tile_to_quadkey(out["x"].to_numpy(),
                                                out["y"].to_numpy(), z))
    if z == 0:
        out["quadkey"] = out["quadkey"].astype(str)
    return out


def _apply_cover(points: DataFrame, plan: PyramidPlan, cell_z: int) -> DataFrame:
    """Encode at cell_z, restricted to the plan's bbox / tile-list cover
    (reference index.js:113-122).  Two-stage filter: a conservative lon/lat
    range predicate on the RAW columns first (reaches the parquet scan as
    PushedFilters — partition/row-group pruning), then the exact integer
    cell-range predicate on the encoded key."""
    ranges = cover_ranges(cell_z, plan.bbox, plan.tiles)
    if not ranges:
        return encode_points(points, cell_z)
    pre = points.where(cover_lonlat_predicate(ranges, cell_z))
    return encode_points(pre, cell_z).where(cover_cell_predicate(ranges))


def build_pyramid(points: DataFrame, plan: PyramidPlan, io: TableIO,
                  resume: bool = True, repartition: int | None = None) -> dict:
    """points(lon, lat, value columns) -> one written level per output zoom.

    Levels are keyed by CELL zoom (output tile zoom + log4(gridsize)), so
    level z's cells are exactly the direct parents of level z+1's cells
    and each rollup is `groupBy(x>>1, y>>1)` — the quadkey-prefix
    invariant (SURVEY.md §2.3 G2).

    Returns {cell_zoom: manifest}.
    """
    spark = points.sparkSession
    manifests: dict[int, dict] = {}

    levels = list(plan.levels())  # [(output_z, cell_z, band)] desc
    base_output_z, base_cell_z, base_band = levels[0]

    # hot-key bookkeeping (SURVEY.md §7 g5 re-salt rule): holistic reducers
    # concentrate a hot cell's values in one task, so each level's manifest
    # records max_cell_rows (the max per-cell point count, read from the
    # count aggregate) and the NEXT rollup salts only when it exceeds
    # plan.hot_key_threshold.  Plans with no holistic reducer skip all of
    # this — algebraic aggs are skew-immune via map-side partials.
    any_holistic = any(s.reducer in HOLISTIC
                       for b in plan.bands for s in b.aggregations)
    count_col = next((s.out for b in plan.bands for s in b.aggregations
                      if s.reducer == "count"), None)

    def _track_max(zoom: int, pdf=None, df=None) -> None:
        if not any_holistic or count_col is None:
            return
        if pdf is not None:
            mx = int(pdf[count_col].max())
        else:
            src = df if df is not None else io.read_level(spark, zoom)
            row = src.agg(F.max(count_col)).collect()[0]
            mx = int(row[0]) if row[0] is not None else 0
        manifests[zoom] = io.amend_manifest(zoom, max_cell_rows=mx)

    def _salt_for(prev_zoom: int, band) -> int:
        if plan.salt_buckets <= 1 or not any(
                s.reducer in HOLISTIC for s in band.aggregations):
            return 0
        prev_max = manifests[prev_zoom].get("max_cell_rows")
        if prev_max is None:  # no count spec to measure with — stay safe
            return plan.salt_buckets
        return plan.salt_buckets if prev_max > plan.hot_key_threshold else 0

    # --- base level: encode + first aggregation -----------------------------
    prev_df = None  # cached handle of the previous level within this run
    if resume and io.level_complete(base_cell_z):
        manifests[base_cell_z] = io.read_manifest(base_cell_z)
    else:
        encoded = _apply_cover(points, plan, base_cell_z)
        if repartition:
            encoded = encoded.repartition(repartition, "x", "y")
        base = cell_aggregate(encoded, base_cell_z,
                              compile_aggs(base_band.aggregations)).persist()
        manifests[base_cell_z] = io.write_level(
            base, base_cell_z,
            lineage={"input": "points", "op": "encode+aggregate",
                     "output_tile_zoom": base_output_z},
        )
        _track_max(base_cell_z, df=base)
        prev_df = base

    # --- rollup levels -------------------------------------------------------
    # distributed while levels are big; once a level fits SMALL_LEVEL_ROWS
    # the remaining pyramid is computed driver-side in one pass (pandas) —
    # removes ~10 near-empty Spark jobs of pure scheduling latency.
    prev_cell_z = base_cell_z
    small_pdf = None
    for output_z, cell_z, band in levels[1:]:
        assert cell_z == prev_cell_z - 1
        if resume and io.level_complete(cell_z):
            manifests[cell_z] = io.read_manifest(cell_z)
            small_pdf = None  # re-read lazily if needed
            if prev_df is not None:
                prev_df.unpersist()
                prev_df = None  # cache is stale relative to the skip point
        elif small_pdf is not None or manifests[prev_cell_z]["row_count"] < SMALL_LEVEL_ROWS:
            if small_pdf is None:
                small_pdf = io.read_level_pandas(prev_cell_z)
            if prev_df is not None:
                prev_df.unpersist()
                prev_df = None  # remaining levels are driver-side
            small_pdf = _rollup_small_pandas(small_pdf, prev_cell_z, band.aggregations)
            manifests[cell_z] = io.write_level_pandas(
                small_pdf, cell_z,
                lineage={"input": f"zoom={prev_cell_z}", "op": "rollup-small",
                         "output_tile_zoom": output_z},
            )
            _track_max(cell_z, pdf=small_pdf)
        else:
            salt = _salt_for(prev_cell_z, band)
            children = (prev_df if prev_df is not None
                        else io.read_level(spark, prev_cell_z))
            level = rollup_level(children, prev_cell_z, band.aggregations,
                                 salt_buckets=salt).persist()
            manifests[cell_z] = io.write_level(
                level, cell_z,
                lineage={"input": f"zoom={prev_cell_z}", "op": "rollup",
                         "output_tile_zoom": output_z, "salted": salt > 1,
                         "salt_buckets": salt},
            )
            _track_max(cell_z, df=level)
            if prev_df is not None:
                prev_df.unpersist()
            prev_df = level
        prev_cell_z = cell_z

    if prev_df is not None:
        prev_df.unpersist()
    return manifests


def incremental_update(delta_points: DataFrame, plan: PyramidPlan,
                       io: TableIO) -> dict:
    """Fold a NEW batch of points into an existing COMPLETE pyramid without
    re-reading raw history (reference users re-run vt-grid over the whole
    mbtiles; here the checkpointed levels + mergeable reducers make the
    delta path exact: every reducer's rollup combiner is a commutative
    monoid, so merge(existing_level, rollup(delta)) == rebuild over the
    union — asserted level-by-level in tests/test_pyramid.py).

    Scale shape (100 TB pyramid, small delta): per level the delta touches
    |delta cells| keys — broadcast that key set, route untouched existing
    rows through a broadcast LEFT ANTI join (no shuffle of the big table),
    and hash-merge only the touched slice with the delta partials.  Cost
    per level = one scan of the level + one tiny shuffle of the touched
    slice, instead of a full rebuild from raw points.  Deletes are out of
    scope (append-only corpus, min/max/union/kmv are insert-monotone).
    """
    spark = delta_points.sparkSession
    levels = list(plan.levels())
    _, base_cell_z, base_band = levels[0]
    for _, cell_z, _ in levels:
        if not io.level_complete(cell_z):
            raise ValueError(
                f"incremental_update needs a complete pyramid; zoom {cell_z} "
                "is missing — run build_pyramid first (resume finishes a "
                "partial build)")

    manifests: dict[int, dict] = {}
    staged = type(io).write_level is TableIO.write_level
    # phase 1 — the per-level delta partial chain, ALL levels persisted up
    # front (r6): the r5 loop unpersisted each level before its child
    # materialized, so every level's broadcast re-ran the whole delta
    # aggregation from raw points.  The chain is materialized by the merge
    # jobs below and released once every level is committed.
    cur = cell_aggregate(_apply_cover(delta_points, plan, base_cell_z),
                         base_cell_z,
                         compile_aggs(base_band.aggregations)).persist()
    work: list[tuple] = []
    prev_cell_z = None
    for output_z, cell_z, band in levels:
        if prev_cell_z is not None:
            cur = rollup_level(cur, prev_cell_z, band.aggregations).persist()
        work.append((output_z, cell_z, band, cur))
        prev_cell_z = cell_z

    def _merge_level(item):
        output_z, cell_z, band, delta = item
        specs = band.aggregations
        existing = io.read_level(spark, cell_z)
        keys = delta.select("x", "y")
        untouched = existing.join(F.broadcast(keys), ["x", "y"], "left_anti")
        touched = existing.join(F.broadcast(keys), ["x", "y"], "left_semi")
        merged = merge_cells([touched, delta], cell_z, specs)
        cols = merged.columns
        # staged write (r6): the merged plan lazily reads the level it
        # replaces, so the parquet backend writes to a sibling dir and
        # swaps after success — ONE materialization per level instead of
        # an eager localCheckpoint followed by a second full write.  The
        # catalog backend has no stage knob; fall back to the checkpoint
        # there (createOrReplace may not be atomic against its own input).
        new_level = untouched.select(*cols).unionByName(merged)
        if not staged:
            new_level = new_level.localCheckpoint(eager=True)
        old = io.read_manifest(cell_z)
        lineage = {"input": f"zoom={cell_z}+delta", "op": "incremental-merge",
                   "output_tile_zoom": output_z,
                   "previous_row_count": old.get("row_count")}
        if staged:
            m = io.write_level(new_level, cell_z, lineage=lineage, stage=True)
        else:
            m = io.write_level(new_level, cell_z, lineage=lineage)
        # hot-key bookkeeping stays valid: recompute the max over the
        # JUST-COMMITTED level files (the merged plan's own lineage would
        # re-read the level files this write replaced)
        if old.get("max_cell_rows") is not None:
            count_col = next((s.out for s in specs
                              if s.reducer == "count"), None)
            if count_col is not None:
                row = io.read_level(spark, cell_z) \
                    .agg(F.max(count_col)).collect()[0]
                mx = int(row[0]) if row[0] is not None else 0
                m = io.amend_manifest(cell_z, max_cell_rows=mx)
        return cell_z, m

    # phase 2 — once the delta chain exists the per-level merges are
    # independent of each other: run them from a small thread pool so one
    # level's write tail back-fills with the next level's tasks (guide
    # §2.6 overlapping independent jobs).  Parquet backend only — the
    # catalog backend appends every manifest to ONE journal table, which
    # concurrent v1 appends could corrupt.
    from concurrent.futures import ThreadPoolExecutor

    workers = min(4, len(work)) if staged else 1
    with ThreadPoolExecutor(max_workers=max(workers, 1)) as pool:
        for cell_z, m in pool.map(_merge_level, work):
            manifests[cell_z] = m
    for *_, d in work:
        d.unpersist()
    return manifests


def build_pyramid_df(points: DataFrame, plan: PyramidPlan) -> DataFrame:
    """In-memory variant (no checkpointing): union of all levels as one
    DataFrame — used by tests and the DuckDB-oracle queries where writing
    to disk is unnecessary."""
    levels = list(plan.levels())
    _, base_cell_z, base_band = levels[0]
    encoded = _apply_cover(points, plan, base_cell_z)
    cur = cell_aggregate(encoded, base_cell_z, compile_aggs(base_band.aggregations))
    out = [cur]
    prev_cell_z = base_cell_z
    for _, cell_z, band in levels[1:]:
        cur = rollup_level(cur, prev_cell_z, band.aggregations,
                           salt_buckets=plan.salt_buckets)
        out.append(cur)
        prev_cell_z = cell_z
    result = out[0]
    for lvl in out[1:]:
        result = result.unionByName(lvl)
    return result
