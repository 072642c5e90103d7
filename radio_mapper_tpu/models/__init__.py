"""Composed pipeline models: detector, TDOA pipeline, streaming correlator."""

from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline

__all__ = ["PipelineConfig", "TDOAPipeline"]
