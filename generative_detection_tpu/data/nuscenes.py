"""nuScenes object-patch dataset — first-party info-pkl reader.

TPU-native rebuild of ``src/data/datasets/nuscenes.py`` WITHOUT the
mmdetection3d/mmengine registry machinery: the mmdet3d ``nuscenes_infos_*.pkl``
schema is read directly (``data_list[i]['images'][CAM]{img_path, cam2img,...}``
and ``data_list[i]['cam_instances'][CAM]`` — the exact fields the reference
consumes, ref nuscenes.py:458-469).

Per-item pipeline (ref nuscenes.py:453-601):
- index = sample x camera (6 cams);
- with p = 1 - negative_sample_prob: pick a random instance, crop a square
  patch around its (optionally perturbed) 2D center with size snapped to
  PATCH_SIZES under perturb_scale, bilinear-resize to 256, build the 2D-bbox
  mask, derive the 4-d patch-NDC+SE(3)-log pose, l/h h w/h box sizes, fill
  factor and a yaw-perturbed pose copy;
- else: a background crop with IoU < 0.5 against every instance bbox;
- invalid samples skip forward to the next index.

Deliberate fix vs the reference: mask bbox coordinates are clamped to the
patch instead of allowing negative (wrap-around) numpy slices
(ref nuscenes.py:178-187 would silently corrupt the mask when a bbox extends
left/above the crop).
"""

from __future__ import annotations

import logging
import math
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry import (
    PatchPerspectiveCameras,
    euler_angles_to_matrix,
    se3_log_map,
    z_world_to_learned,
)
from . import native
from .synthetic import LABEL_ID2NAME, LABEL_NAME2ID

CAM_NAMESPACE = "CAM"
CAMERAS = ["FRONT", "FRONT_RIGHT", "FRONT_LEFT", "BACK", "BACK_LEFT", "BACK_RIGHT"]
CAMERA_NAMES = [f"{CAM_NAMESPACE}_{c}" for c in CAMERAS]

Z_NEAR, Z_FAR = 0.01, 55.0
NUSC_IMG_WIDTH, NUSC_IMG_HEIGHT = 1600, 900
POSE_DIM, LHW_DIM, BBOX_3D_DIM = 4, 3, 7
PATCH_SIZES = [50, 100, 200, 400]


def _box_iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one (4,) box against (N, 4) boxes, xyxy."""
    if boxes.size == 0:
        return np.zeros((0,), np.float32)
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-9)


class _FrameSource:
    """One camera frame, decoded lazily and regionally.

    Every dataset item needs only a small (50–400 px) square window of the
    1600x900 frame, but a PIL decode pays for the whole frame (16.8 of the
    18.6 ms/item — docs/BENCH.md "Loader"). ``region`` serves zero-padded
    windows through the native libjpeg ROI decoder (``native/jpegdec.cpp``:
    scanline skip + iMCU column crop + early abort, bit-identical to full
    decode), falling back to one cached PIL full decode for non-JPEG / non-RGB
    sources or when the native lib is absent.
    """

    def __init__(self, path: str):
        from PIL import Image

        self._path = path
        self.pil = Image.open(path)  # lazy: parses the header only
        self.size = self.pil.size
        self.mode = self.pil.mode
        self._full: Optional[np.ndarray] = None
        self._try_native = self.pil.format == "JPEG" and self.mode == "RGB"

    def _full_array(self) -> np.ndarray:
        if self._full is None:
            img = self.pil if self.mode == "RGB" else self.pil.convert("RGB")
            self._full = np.asarray(img, np.uint8)
        return self._full

    def region(self, x1: int, y1: int, w: int, h: int) -> np.ndarray:
        """(h, w, 3) uint8 window at [x1, y1); out-of-frame pixels are 0."""
        if self._try_native and self._full is None:
            out = native.jpeg_region_file(self._path, int(x1), int(y1), int(w), int(h))
            if out is not None:
                return out
            self._try_native = False  # undecodable stream: PIL from here on
        arr = self._full_array()
        out = np.zeros((h, w, 3), np.uint8)
        ix1, iy1 = max(x1, 0), max(y1, 0)
        ix2, iy2 = min(x1 + w, arr.shape[1]), min(y1 + h, arr.shape[0])
        if ix2 > ix1 and iy2 > iy1:
            out[iy1 - y1 : iy2 - y1, ix1 - x1 : ix2 - x1] = arr[iy1:iy2, ix1:ix2]
        return out


class NuScenesBase:
    ann_file: str = "nuscenes_infos_train.pkl"
    split: str = "train"

    def __init__(
        self,
        data_root: str,
        label_names: List[str],
        patch_height: int = 256,
        patch_aspect_ratio: float = 1.0,
        is_sweep: bool = False,
        perturb_center: bool = False,
        perturb_scale: bool = False,
        negative_sample_prob: float = 0.5,
        h_minmax_dir: str = "dataset_stats/combined",
        ann_file: Optional[str] = None,
        seed: Optional[int] = None,
        device_preprocess: bool = False,
        **_ignored,  # mmdet3d kwargs (pipeline, modality, box_type_3d, ...)
    ):
        self.data_root = data_root
        self.img_root = os.path.join(data_root, "sweeps" if is_sweep else "samples")
        if ann_file is not None:
            self.ann_file = ann_file
        ann_path = os.path.join(data_root, self.ann_file)
        with open(ann_path, "rb") as f:
            infos = pickle.load(f)
        self.data_list = self._validate_infos(infos, ann_path)

        self.label_names = list(label_names)
        self.label_ids = [LABEL_NAME2ID[n] for n in self.label_names]
        self.label_id2class_id = {lab: i for i, lab in enumerate(self.label_ids)}
        self.patch_size = (patch_height, int(patch_height * patch_aspect_ratio))
        self.perturb_center = perturb_center
        self.perturb_scale = perturb_scale
        self.negative_sample_prob = (
            negative_sample_prob if "background" in self.label_names else 0.0
        )
        self.hmin_dict, self.hmax_dict = self._load_h_minmax(h_minmax_dir)
        self.num_cameras = len(CAMERA_NAMES)
        self._rng = np.random.default_rng(seed)
        # device_preprocess: the host ships RAW uint8 crops (padded into a
        # fixed max(PATCH_SIZES) buffer) + the mask rectangle; resize /
        # normalize / mask rasterization run on-device inside the step's jit
        # (ops.resize.batched_crop_resize + ops.resize.bbox_mask; the
        # BASELINE "jit preprocessing" stage). Crops larger than the buffer
        # (rare close-ups) are pre-shrunk to the buffer size on host.
        self.device_preprocess = device_preprocess

    @staticmethod
    def _validate_infos(infos, ann_path: str):
        """Accept the mmdet3d >=1.1 info-pkl layouts and fail LOUDLY on
        anything else (the reference consumes the v1.1+ schema via
        mmdet3d.NuScenesDataset, ref nuscenes.py:458-469):

        - ``{"metainfo": {...}, "data_list": [...]}`` (the standard writer);
        - a bare ``[...]`` list of per-sample dicts (some custom exports).

        Each entry must carry ``images[CAM_X]{img_path, cam2img}`` and
        ``cam_instances``. The pre-1.1 schema (``{"infos": ...}``, per-sample
        ``cams``/``gt_boxes``) is detected and rejected with a pointer to the
        mmdet3d update script rather than failing deep in the loader.
        """
        if isinstance(infos, dict):
            if "infos" in infos and "data_list" not in infos:
                raise ValueError(
                    f"{ann_path}: pre-1.1 mmdet3d info-pkl layout "
                    "('infos' key, per-sample 'cams'). Regenerate with "
                    "mmdet3d >= 1.1 (tools/dataset_converters/update_infos_to_v2.py) "
                    "— this reader consumes the v1.1+ "
                    "{'metainfo', 'data_list'} schema."
                )
            if "data_list" not in infos:
                raise ValueError(
                    f"{ann_path}: unrecognized info-pkl dict layout "
                    f"(keys: {sorted(infos.keys())[:8]}); expected "
                    "{'metainfo', 'data_list'}."
                )
            data_list = infos["data_list"]
        elif isinstance(infos, list):
            data_list = infos
        else:
            raise ValueError(
                f"{ann_path}: expected a dict or list info-pkl, got "
                f"{type(infos).__name__}."
            )
        if data_list:
            first = data_list[0]
            if not isinstance(first, dict) or "images" not in first:
                have = sorted(first.keys())[:10] if isinstance(first, dict) else type(first).__name__
                raise ValueError(
                    f"{ann_path}: data_list entries lack the 'images' camera "
                    f"table (got {have}); this reader needs the mmdet3d "
                    "v1.1+ frame-based layout (images[CAM_X] + cam_instances)."
                )
            if "cam_instances" not in first:
                raise ValueError(
                    f"{ann_path}: data_list entries lack 'cam_instances' — "
                    "regenerate the pkl with camera instances "
                    "(mmdet3d create_data with --with-cam-instances / "
                    "frame-based loading, ref configs use "
                    "load_type='frame_based')."
                )
        return data_list

    @staticmethod
    def _load_h_minmax(h_minmax_dir: str) -> Tuple[Dict, Dict]:
        hmin_path = os.path.join(h_minmax_dir, "hmin.pkl")
        hmax_path = os.path.join(h_minmax_dir, "hmax.pkl")
        try:
            with open(hmin_path, "rb") as f:
                hmin = pickle.load(f)
            with open(hmax_path, "rb") as f:
                hmax = pickle.load(f)
            return hmin, hmax
        except (FileNotFoundError, OSError):
            logging.warning(
                "hmin/hmax stats not found under %s; using defaults "
                "(run compute_dataset_stats.py + compute_hmin_hmax.py)",
                h_minmax_dir,
            )
            names = [n for n in LABEL_NAME2ID if n != "background"]
            return {n: 0.5 for n in names}, {n: 4.0 for n in names}

    def __len__(self):
        return len(self.data_list) * self.num_cameras

    # -- patch cropping (ref _generate_patch, nuscenes.py:90-194) ---------------

    def _crop_object_patch(self, img, bbox, center_2d):
        """Returns (patch_resized float32 HWC in [0,1], patch_size_px,
        resampling_factor, padding_pixels_resampled, mask_resized) or None."""
        from PIL import Image

        W, H = img.size
        if not (0 <= center_2d[0] < W and 0 <= center_2d[1] < H):
            return None
        x1, y1, x2, y2 = (int(v) for v in bbox)
        width, height = x2 - x1, y2 - y1
        center = np.floor(np.asarray(center_2d)).astype(np.int64)
        box_size = max(width, height)
        corner_case = x1 >= W or y1 >= H or x2 <= 0 or y2 <= 0

        if corner_case:
            cx1, cy1 = max(0, x1), max(0, y1)
            cx2, cy2 = min(W, x2), min(H, y2)
            max_dim = max(cx2 - cx1, cy2 - cy1)
            box_size = min(PATCH_SIZES, key=lambda p: abs(max_dim - p))
            nx1 = cx1 + ((cx2 - cx1) - box_size) // 2
            ny1 = cy1 + ((cy2 - cy1) - box_size) // 2
            center = np.asarray([nx1 + box_size // 2, ny1 + box_size // 2])
        elif self.perturb_scale:
            box_size = min(PATCH_SIZES, key=lambda p: abs(box_size - p))
            center[0] = np.clip(center[0], box_size // 2, W - box_size // 2)
            center[1] = np.clip(center[1], box_size // 2, H - box_size // 2)

        padding_pixels = max(int(width) - int(height), 0)
        px1 = int(center[0]) - box_size // 2
        py1 = int(center[1]) - box_size // 2
        if box_size <= 0:
            return None

        out_w, out_h = self.patch_size[1], self.patch_size[0]
        resampling_factor = out_w / box_size
        bbox_in_crop = (bbox[0] - px1, bbox[1] - py1, bbox[2] - px1, bbox[3] - py1)
        padding_pixels_early = max(int(width) - int(height), 0)

        if self.device_preprocess:
            raw = self._materialize_raw(img, px1, py1, box_size, bbox_in_crop)
            if raw is None:
                return None
            return (
                raw,  # dict of raw-device fields instead of a float patch
                float(box_size),
                resampling_factor,
                padding_pixels_early * resampling_factor,
                None,
            )

        patch_np = None
        if img.mode == "RGB":
            crop_u8 = img.region(px1, py1, box_size, box_size)
            patch_np = native.crop_resize_bilinear(crop_u8, 0, 0, box_size, out_h, out_w)
        if patch_np is not None:  # native single-pass crop+resize+mask
            mask_np = native.bbox_mask(box_size, bbox_in_crop, out_h, out_w)[..., None]
        else:  # PIL fallback
            patch = img.pil.crop((px1, py1, px1 + box_size, py1 + box_size))
            patch_resized = patch.resize(
                (out_w, out_h), resample=Image.Resampling.BILINEAR, reducing_gap=1.0
            )
            mask = np.zeros((box_size, box_size), dtype=np.uint8)
            mx1 = max(int(bbox_in_crop[0]), 0)
            my1 = max(int(bbox_in_crop[1]), 0)
            mx2 = max(int(bbox_in_crop[2]), 0)
            my2 = max(int(bbox_in_crop[3]), 0)
            mask[my1:my2, mx1:mx2] = 255
            mask_resized = Image.fromarray(mask).resize(
                (out_w, out_h), resample=Image.Resampling.NEAREST
            )
            patch_np = np.asarray(patch_resized, dtype=np.float32) / 255.0
            if patch_np.ndim == 2:
                patch_np = np.repeat(patch_np[..., None], 3, -1)
            patch_np = patch_np[..., :3]
            mask_np = (np.asarray(mask_resized, dtype=np.float32) / 255.0)[..., None]

        padding_resampled = padding_pixels * resampling_factor
        return (
            patch_np,
            float(box_size),
            resampling_factor,
            padding_resampled,
            mask_np,
        )

    def _materialize_raw(self, img, px1, py1, box_size, bbox_in_crop):
        """Device-preprocess crop materialization: a raw uint8 square crop
        padded into a fixed ``max(PATCH_SIZES)`` buffer plus the mask
        rectangle — the device finishes resize/normalize/mask inside jit
        (ops.resize.batched_crop_resize / bbox_mask). Crops larger than the
        buffer are pre-shrunk on host (two-stage resampling, rare close-ups).
        Out-of-frame pixels stay 0 (PIL crop semantics)."""
        buf_size = max(PATCH_SIZES)
        if box_size > buf_size:
            crop_u8 = img.region(px1, py1, box_size, box_size)
            shrunk = native.crop_resize_bilinear(
                crop_u8, 0, 0, box_size, buf_size, buf_size
            )
            if shrunk is None:
                from PIL import Image

                pil = Image.fromarray(crop_u8).resize(
                    (buf_size, buf_size), resample=Image.Resampling.BILINEAR
                )
                shrunk = np.asarray(pil, np.float32) / 255.0
            raw = np.clip(shrunk * 255.0 + 0.5, 0, 255).astype(np.uint8)
            scale = buf_size / box_size
            bic = np.asarray([v * scale for v in bbox_in_crop], np.float32)
            src_size = float(buf_size)
        else:
            raw = np.zeros((buf_size, buf_size, 3), np.uint8)
            raw[:box_size, :box_size] = img.region(px1, py1, box_size, box_size)
            bic = np.asarray(bbox_in_crop, np.float32)
            src_size = float(box_size)
        return {
            "patch_raw": raw,
            "patch_src_size": np.float32(src_size),
            "bbox_in_crop": bic,
            "patch_out_size": np.int32(self.patch_size[0]),
        }

    # -- pose label math (ref _get_pose_6d_lhw, nuscenes.py:244-332) ------------

    def _pose_labels(self, cam2img, bbox_3d, patch_center, patch_size_px, resampling_factor, fill_factor, label_name):
        """Pure-numpy closed-form label math on the loader thread (the jnp
        transform-stack variant ``_pose_labels_impl`` is the equivalence-test
        reference; per-item device dispatch dominated loader latency)."""
        from ..geometry.host import pose_labels_numpy

        K = np.asarray(cam2img, np.float32)
        x, y, z, l, h, w, yaw = (float(v) for v in bbox_3d)
        return pose_labels_numpy(
            x, y, z, l, h, w, yaw,
            patch_center, patch_size_px, resampling_factor, fill_factor,
            hmin=self.hmin_dict[label_name], hmax=self.hmax_dict[label_name],
            patch_out=self.patch_size[0],
            focal=float(K[0, 0]), px=float(K[0, 2]), py=float(K[1, 2]),
            img_w=NUSC_IMG_WIDTH, img_h=NUSC_IMG_HEIGHT,
        )

    def _pose_labels_impl(self, cam, bbox_3d, patch_center, patch_size_px, resampling_factor, fill_factor, label_name):
        x, y, z, l, h, w, yaw = (float(v) for v in bbox_3d)
        import jax.numpy as jnp

        pt = jnp.asarray([[[x, y, z]]], jnp.float32)
        p_ndc = np.asarray(
            cam.transform_points_patch_ndc(
                pt,
                patch_size=[[patch_size_px, patch_size_px]],
                patch_center=[list(patch_center)],
            )
        ).reshape(-1)
        x_patch, y_patch = float(p_ndc[0]), float(p_ndc[1])

        padding_pixels_resampled = fill_factor * self.patch_size[0]
        focal = float(np.asarray(cam.focal_length).reshape(-1)[0])  # negated
        hmin, hmax = self.hmin_dict[label_name], self.hmax_dict[label_name]
        zmin = -(hmin * focal) / (self.patch_size[0] - padding_pixels_resampled)
        zmax = -(hmax * focal) / (self.patch_size[0] - padding_pixels_resampled)
        z_learned = float(
            z_world_to_learned(z, zmin=zmin, zmax=zmax, patch_resampling_factor=resampling_factor)
        )

        R = np.asarray(euler_angles_to_matrix(np.asarray([0.0, 0.0, yaw], np.float32), "XYZ"))
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R
        M[:3, 3] = [x_patch, y_patch, z_learned]
        log = np.asarray(se3_log_map(np.asarray(M.T)[None]))[0]
        if not np.all(np.isfinite(log)):
            return None
        pose_6d = np.zeros(POSE_DIM, np.float32)
        pose_6d[:3] = log[:3]
        pose_6d[3] = log[5]
        bbox_sizes = np.asarray([l / h, h, w / h], np.float32)
        return pose_6d, bbox_sizes, yaw

    def _perturbed_v3(self, yaw: float) -> Tuple[float, float]:
        """(v3_perturbed, yaw_perturbed) (ref :196-242). For a pure-yaw
        row-form SE(3) matrix the log's v3 is exactly -yaw (see
        tests/test_geometry.py::test_se3_log_of_dataset_style_matrix), so no
        per-item device math is needed."""
        delta = math.radians(self._rng.uniform(30.0, 90.0))
        yp = yaw + delta if self._rng.random() > 0.5 else yaw - delta
        if yp < -math.pi:
            yp += 2 * math.pi
        elif yp > math.pi:
            yp -= 2 * math.pi
        return -yp, yp

    def _perturbed_center(self, center_2d, bbox):
        """Random in-bbox center shift (ref get_perturbed_patch :334-357)."""
        x1, y1, x2, y2 = bbox
        max_p = 0.5 * min(x2 - x1, y2 - y1)
        dx = self._rng.uniform(-max_p, max_p)
        max_dy = math.sqrt(max(max_p**2 - dx**2, 0.0))
        dy = self._rng.uniform(-max_dy, max_dy)
        return [int(center_2d[0] + dx), int(center_2d[1] + dy)]

    def _camera_for(self, cam2img) -> PatchPerspectiveCameras:
        K = np.asarray(cam2img, np.float32)
        focal = -K[0, 0]  # negated focal (ref :394-398)
        pp = [[float(K[0, 2]), float(K[1, 2])]]
        return PatchPerspectiveCameras.create(
            focal_length=focal,
            principal_point=pp,
            image_size=[[NUSC_IMG_HEIGHT, NUSC_IMG_WIDTH]],
            znear=Z_NEAR,
            zfar=Z_FAR,
        )

    # -- item assembly -------------------------------------------------------------

    def _object_item(self, sample, cam_name, instance) -> Optional[Dict]:
        from PIL import Image

        img_info = sample["images"][cam_name]
        img_file = os.path.basename(img_info["img_path"])
        img_path = os.path.join(self.img_root, cam_name, img_file)
        try:
            img = _FrameSource(img_path)
        except (FileNotFoundError, OSError):
            return None

        center_2d = list(instance["center_2d"])
        bbox = list(instance["bbox"])
        if self.perturb_center:
            center_2d = self._perturbed_center(center_2d, bbox)

        crop = self._crop_object_patch(img, bbox, center_2d)
        if crop is None:
            return None
        patch, patch_size_px, resampling, padding_resampled, mask = crop
        fill_factor = padding_resampled / self.patch_size[0]

        label_id = int(instance["bbox_label"])
        label_name = LABEL_ID2NAME[label_id]
        labels = self._pose_labels(
            img_info["cam2img"],
            instance["bbox_3d"],
            center_2d,
            patch_size_px,
            resampling,
            fill_factor,
            label_name,
        )
        if labels is None:
            return None
        pose_6d, bbox_sizes, yaw = labels
        v3_pert, yaw_pert = self._perturbed_v3(yaw)
        pose_pert = pose_6d.copy()
        pose_pert[3] = v3_pert

        image_fields = (
            dict(patch) if isinstance(patch, dict)  # device-preprocess raw crop
            else {"patch": patch, "mask_2d_bbox": mask}
        )
        return {
            **image_fields,
            "class_id": self.label_id2class_id[label_id],
            "original_class_id": label_id,
            "class_name": label_name,
            "pose_6d": pose_6d,
            "bbox_sizes": bbox_sizes,
            "yaw": np.float32(yaw),
            "yaw_perturbed": np.float32(yaw_pert),
            "pose_6d_perturbed": pose_pert,
            "fill_factor": np.float32(fill_factor),
            "patch_size": np.asarray([[patch_size_px, patch_size_px]], np.float32),
            "patch_center_2d": np.asarray(center_2d, np.float32),
            "resampling_factor": np.float32(resampling),
            "bbox_3d_gt": np.asarray(instance["bbox_3d"], np.float32),
            "cam2img": np.asarray(img_info["cam2img"], np.float32).reshape(3, 3),
        }

    def _background_item(self, sample, cam_name, instances) -> Optional[Dict]:
        from PIL import Image

        img_info = sample["images"][cam_name]
        img_file = os.path.basename(img_info["img_path"])
        img_path = os.path.join(self.img_root, cam_name, img_file)
        try:
            img = _FrameSource(img_path)
        except (FileNotFoundError, OSError):
            return None
        W, H = img.size
        boxes = np.asarray([inst["bbox"] for inst in instances], np.float32).reshape(-1, 4)
        crop_u8 = None
        ps = 0
        for _ in range(10):  # timeout_iters (ref :574)
            ps = int(self._rng.choice(PATCH_SIZES))
            cx = int(self._rng.integers(0, max(W - ps, 1)))
            cy = int(self._rng.integers(0, max(H - ps, 1)))
            cand = np.asarray([cx, cy, cx + ps, cy + ps], np.float32)
            if boxes.shape[0] == 0 or np.all(_box_iou(cand, boxes) < 0.5):
                crop_u8 = img.region(cx, cy, ps, ps)
                break
        if crop_u8 is None:
            return None
        out_w, out_h = self.patch_size[1], self.patch_size[0]
        if self.device_preprocess:
            buf_size = max(PATCH_SIZES)
            raw = np.zeros((buf_size, buf_size, 3), np.uint8)
            raw[:ps, :ps] = crop_u8
            image_fields = {
                "patch_raw": raw,
                "patch_src_size": np.float32(ps),
                "bbox_in_crop": np.zeros(4, np.float32),  # empty mask rect
                "patch_out_size": np.int32(out_h),
            }
        else:
            patch = native.resize_bilinear(crop_u8, out_h, out_w)
            if patch is None:  # PIL fallback
                pil = Image.fromarray(crop_u8).resize(
                    (out_w, out_h), resample=Image.Resampling.BILINEAR
                )
                patch = np.asarray(pil, dtype=np.float32) / 255.0
            image_fields = {
                "patch": patch,
                "mask_2d_bbox": np.zeros((out_h, out_w, 1), np.float32),
            }
        bg_id = LABEL_NAME2ID["background"]
        return {
            **image_fields,
            "class_id": self.label_id2class_id[bg_id],
            "original_class_id": bg_id,
            "class_name": "background",
            "pose_6d": np.zeros(POSE_DIM, np.float32),
            "bbox_sizes": np.zeros(LHW_DIM, np.float32),
            "yaw": np.float32(0.0),
            "yaw_perturbed": np.float32(0.0),
            "pose_6d_perturbed": np.zeros(POSE_DIM, np.float32),
            "fill_factor": np.float32(0.0),
            "patch_size": np.asarray([[out_h, out_w]], np.float32),
            "patch_center_2d": np.asarray([out_h // 2, out_w // 2], np.float32),
            "resampling_factor": np.float32(out_w / ps),
            "bbox_3d_gt": np.zeros(BBOX_3D_DIM, np.float32),
            "cam2img": np.asarray(img_info["cam2img"], np.float32).reshape(3, 3),
        }

    def __getitem__(self, idx: int) -> Dict:
        n = len(self)
        for _attempt in range(n):  # skip-forward (ref :475-490), loop not recursion
            i = (idx + _attempt) % n
            sample_idx, cam_idx = divmod(i, self.num_cameras)
            sample = self.data_list[sample_idx]
            cam_name = CAMERA_NAMES[cam_idx]
            instances = [
                inst
                for inst in sample.get("cam_instances", {}).get(cam_name, [])
                if inst["bbox_label"] in self.label_ids
            ]
            if self._rng.random() <= (1.0 - self.negative_sample_prob):
                if not instances:
                    continue
                inst = instances[int(self._rng.integers(0, len(instances)))]
                item = self._object_item(sample, cam_name, inst)
            else:
                item = self._background_item(sample, cam_name, instances)
            if item is not None:
                item["sample_idx"] = sample_idx
                item["cam_idx"] = cam_idx
                item["cam_name"] = cam_name
                return item
        raise RuntimeError("no valid sample found in the entire dataset")


class NuScenesTrain(NuScenesBase):
    split = "train"
    ann_file = "nuscenes_infos_train.pkl"


class NuScenesValidation(NuScenesBase):
    split = "validation"
    ann_file = "nuscenes_infos_val.pkl"


class NuScenesTest(NuScenesBase):
    split = "test"
    ann_file = "nuscenes_infos_test.pkl"


class NuScenesTrainMini(NuScenesBase):
    split = "train-mini"
    ann_file = "nuscenes_mini_infos_train.pkl"


class NuScenesValidationMini(NuScenesBase):
    split = "val-mini"
    ann_file = "nuscenes_mini_infos_val.pkl"
