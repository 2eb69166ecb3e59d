"""Streaming pyramid maintenance: a Structured Streaming sink that keeps
a checkpointed TableIO pyramid fresh as point batches arrive.

The production shape for "events flow in, tiles stay current": the first
microbatch bootstraps the pyramid with :func:`operators.pyramid.
build_pyramid`; every later microbatch folds in through
:func:`operators.pyramid.incremental_update` — per level one scan of the
existing cells plus a delta-sized shuffle (broadcast anti/semi routing),
never a rebuild from raw history.  Exactness holds because every aggspec
reducer's rollup combiner is a commutative monoid (the same property the
batch delta path proves in tests/test_pyramid.py::
test_incremental_update_equals_rebuild), so after N microbatches the
pyramid is IDENTICAL to a one-shot batch build over the union — asserted
stream-vs-batch in tests/test_streaming_custom.py.

Delivery semantics: foreachBatch is at-least-once on retry, and
incremental_update is NOT idempotent (folding the same delta twice
double-counts), so the sink journals applied batch ids in the output
root (``_stream/applied.json``) and skips replays — the standard
exactly-once recipe for non-idempotent foreachBatch sinks (batch id +
transactional-ish commit), kept file-local like TableIO's manifests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from vt_grid_spark.operators.pyramid import build_pyramid, incremental_update
from vt_grid_spark.plans.pyramid_plan import PyramidPlan
from vt_grid_spark.sources.table_io import TableIO


class PyramidStreamSink:
    """``writeStream.foreachBatch(PyramidStreamSink(plan, io))``.

    The callable contract is (batch_df, batch_id).  State is one tiny
    JSON journal in the pyramid root; the Spark checkpointLocation owns
    offsets, the journal owns idempotence across foreachBatch retries.
    """

    def __init__(self, plan: PyramidPlan, io: TableIO):
        self.plan = plan
        self.io = io

    # -- applied-batch journal ------------------------------------------------
    @property
    def _journal_path(self) -> str:
        return os.path.join(self.io.root, "_stream", "applied.json")

    def _applied(self) -> list[int]:
        try:
            with open(self._journal_path) as f:
                return json.load(f)["batches"]
        except FileNotFoundError:
            return []

    def _mark_applied(self, batch_id: int) -> None:
        path = self._journal_path
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batches": self._applied() + [int(batch_id)]}, f)
        os.replace(tmp, path)

    # -- the sink -------------------------------------------------------------
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if int(batch_id) in self._applied():
            return  # foreachBatch retry of an already-folded delta
        if batch.isEmpty():
            self._mark_applied(batch_id)
            return
        # localCheckpoint: incremental_update runs one job per level over
        # the delta — without it each level would re-read the stream
        # batch's source files
        batch = batch.localCheckpoint()
        try:
            base_z = next(iter(self.plan.levels()))[1]  # levels are desc
            if self.io.level_complete(base_z):
                incremental_update(batch, self.plan, self.io)
            else:
                build_pyramid(batch, self.plan, self.io, resume=False)
            self._mark_applied(batch_id)
        finally:
            batch.unpersist()


def maintain_pyramid(stream: DataFrame, plan: PyramidPlan, io: TableIO,
                     checkpoint_dir: str, trigger_available_now: bool = True):
    """Convenience wrapper: attach the sink to a streaming DataFrame of
    points (lon, lat, value columns) and return the started query."""
    writer = (stream.writeStream
              .foreachBatch(PyramidStreamSink(plan, io))
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
