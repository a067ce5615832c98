from .pipeline import PipelineConfig, PosePipeline

__all__ = ["PipelineConfig", "PosePipeline"]
