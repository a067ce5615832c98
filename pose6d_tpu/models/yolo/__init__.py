from .model import YoloConfig, YoloV8
from .decode import decode_outputs, batched_nms, nms_fixed, make_anchors, detect
from .loss import detection_loss, tal_assign, ciou_xyxy
from .train import DetTrainConfig, DetectionTrainer, evaluate_map50

__all__ = [
    "YoloConfig",
    "YoloV8",
    "decode_outputs",
    "batched_nms",
    "nms_fixed",
    "make_anchors",
    "detect",
    "detection_loss",
    "tal_assign",
    "ciou_xyxy",
    "DetTrainConfig",
    "DetectionTrainer",
    "evaluate_map50",
]
