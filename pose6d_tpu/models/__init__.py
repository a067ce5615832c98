from .posenet import PoseNet, PoseNetConfig, CrossModalAttention, ZBackbone
from .resnet import ResNet, ResNet50
from .convert import torchvision_resnet50_to_flax, load_torch_state_dict
from .pretrained import init_posenet_with_pretrained

__all__ = [
    "PoseNet",
    "PoseNetConfig",
    "CrossModalAttention",
    "ZBackbone",
    "ResNet",
    "ResNet50",
    "torchvision_resnet50_to_flax",
    "load_torch_state_dict",
    "init_posenet_with_pretrained",
]
