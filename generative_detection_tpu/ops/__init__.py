from .norm import group_norm
from .attention import single_head_attention
from .focal import sigmoid_focal_loss
from .fused_conv import gn_silu_conv
from .resize import batched_crop_resize, bbox_mask, resize_bilinear, resize_nearest

__all__ = [
    "group_norm",
    "single_head_attention",
    "sigmoid_focal_loss",
    "batched_crop_resize",
    "bbox_mask",
    "gn_silu_conv",
    "resize_bilinear",
    "resize_nearest",
]
