from .linemod import Sample, build_index, split_of_index
from .crop import (
    CropParams,
    adjust_K_for_crop,
    compute_crop_params,
    crop_resize_image,
    jitter_bbox,
    normalize_depth,
)
from .pipeline import LineMODPoseLoader
from .detection import DetectionLoader, prepare_yolo_dataset
from .synthetic import generate_synthetic_linemod

__all__ = [
    "Sample",
    "build_index",
    "split_of_index",
    "CropParams",
    "adjust_K_for_crop",
    "compute_crop_params",
    "crop_resize_image",
    "jitter_bbox",
    "normalize_depth",
    "LineMODPoseLoader",
    "DetectionLoader",
    "prepare_yolo_dataset",
    "generate_synthetic_linemod",
]
