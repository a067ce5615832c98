from .augment import (
    AugmentConfig,
    color_jitter,
    eval_preprocess,
    normalize,
    random_erasing,
    random_grayscale,
    rgb_to_grayscale,
    train_augment,
)
from .crop_resize import (
    crop_params_from_bbox,
    crop_resize_bilinear,
    crop_resize_matmul,
)
from .pallas_addmin import pairwise_min_dist_pallas

__all__ = [
    "AugmentConfig",
    "color_jitter",
    "eval_preprocess",
    "normalize",
    "random_erasing",
    "random_grayscale",
    "rgb_to_grayscale",
    "train_augment",
    "crop_params_from_bbox",
    "crop_resize_bilinear",
    "crop_resize_matmul",
    "pairwise_min_dist_pallas",
]
