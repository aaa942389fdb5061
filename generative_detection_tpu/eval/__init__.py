from .detection import evaluate_detections
from .inference import recover_boxes, pose_inference
from .metrics import psnr, detection_metrics

__all__ = [
    "evaluate_detections",
    "recover_boxes",
    "pose_inference",
    "psnr",
    "detection_metrics",
]
