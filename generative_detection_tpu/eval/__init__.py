from .detection import evaluate_detections
from .inference import frame_ids_from_batch, pose_inference, recover_boxes
from .metrics import psnr, detection_metrics

__all__ = [
    "evaluate_detections",
    "recover_boxes",
    "frame_ids_from_batch",
    "pose_inference",
    "psnr",
    "detection_metrics",
]
