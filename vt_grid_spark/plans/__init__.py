"""Logical configuration: aggregation specs and pyramid plans."""

from vt_grid_spark.plans.aggspec import AggSpec, compile_aggs, compile_rollup_aggs  # noqa: F401
from vt_grid_spark.plans.pyramid_plan import PyramidPlan, ZoomBand  # noqa: F401
