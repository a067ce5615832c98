from .pose_loss import geodesic_distance, quaternion_l1, pose_loss, PoseLossConfig
from .add import ADDEvaluator, add_metrics, load_object_models

__all__ = [
    "geodesic_distance",
    "quaternion_l1",
    "pose_loss",
    "PoseLossConfig",
    "ADDEvaluator",
    "add_metrics",
    "load_object_models",
]
