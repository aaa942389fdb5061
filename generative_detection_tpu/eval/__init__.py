from .inference import recover_boxes, pose_inference
from .metrics import psnr, detection_metrics

__all__ = ["recover_boxes", "pose_inference", "psnr", "detection_metrics"]
