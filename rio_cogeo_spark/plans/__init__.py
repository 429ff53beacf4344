"""Logical plan objects (the vrt_params analog)."""

from rio_cogeo_spark.operators.translate import BandSpec, TileJobPlan, plan_tile_job

__all__ = ["BandSpec", "TileJobPlan", "plan_tile_job"]
