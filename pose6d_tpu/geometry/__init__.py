from .quat import (
    quat_normalize,
    quat_to_mat,
    mat_to_quat,
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_canonical,
)
from .pinhole import (
    pinhole_xy_from_z,
    project_points,
    adjust_intrinsics_for_crop,
    DEFAULT_K,
)

__all__ = [
    "quat_normalize",
    "quat_to_mat",
    "mat_to_quat",
    "quat_mul",
    "quat_conj",
    "quat_rotate",
    "quat_canonical",
    "pinhole_xy_from_z",
    "project_points",
    "adjust_intrinsics_for_crop",
    "DEFAULT_K",
]
