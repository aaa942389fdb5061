"""ctypes bindings for the native (C++) patch-pipeline ops.

Replaces the reference's PIL crop/resize/mask host path (ref
nuscenes.py:90-194) with a single native pass when ``native/libpatchops.so``
is available (built lazily via ``make``); pure-numpy/PIL fallback otherwise.
Disable with ``GDT_NATIVE_LOADER=0``.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GDT_NATIVE_LOADER", "1") == "0":
        return None
    so = os.path.join(_native_dir(), "libpatchops.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # noqa: BLE001
            logging.warning("native patchops build failed (%s); using PIL path", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logging.warning("native patchops load failed (%s); using PIL path", e)
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    f = ctypes.c_float
    lib.crop_resize_bilinear_u8.argtypes = [u8p, i, i, i, i, i, i, i, f32p, i, i]
    lib.crop_resize_bilinear_u8.restype = None
    lib.bbox_mask_resize.argtypes = [i, f, f, f, f, f32p, i, i]
    lib.bbox_mask_resize.restype = None
    lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, f32p, i, i]
    lib.resize_bilinear_u8.restype = None
    lib.max_iou.argtypes = [f32p, f32p, i]
    lib.max_iou.restype = f
    _LIB = lib
    return _LIB


def crop_resize_bilinear(
    img_u8: np.ndarray, x1: int, y1: int, size: int, out_h: int, out_w: int
) -> Optional[np.ndarray]:
    """Square crop [x1, y1, x1+size)^2 (zero-padded OOB) + bilinear resize.
    Returns (out_h, out_w, C) float32 in [0,1], or None if native lib absent."""
    lib = load_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.crop_resize_bilinear_u8(img_u8, h, w, c, x1, y1, size, size, out, out_h, out_w)
    return out


def bbox_mask(
    crop_size: int, bbox_in_crop, out_h: int, out_w: int
) -> Optional[np.ndarray]:
    lib = load_lib()
    if lib is None:
        return None
    out = np.empty((out_h, out_w), np.float32)
    bx1, by1, bx2, by2 = (float(v) for v in bbox_in_crop)
    lib.bbox_mask_resize(crop_size, bx1, by1, bx2, by2, out, out_h, out_w)
    return out


def resize_bilinear(img_u8: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    lib = load_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    out = np.empty((out_h, out_w, c), np.float32)
    lib.resize_bilinear_u8(img_u8, h, w, c, out, out_h, out_w)
    return out


def max_iou(box: np.ndarray, boxes: np.ndarray) -> Optional[float]:
    lib = load_lib()
    if lib is None or boxes.size == 0:
        return None
    box = np.ascontiguousarray(box, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    return float(lib.max_iou(box, boxes, boxes.shape[0]))


# -- region-of-interest JPEG decode (native/jpegdec.cpp) ----------------------

_JLIB: Optional[ctypes.CDLL] = None
_JTRIED = False


def load_jpeg_lib() -> Optional[ctypes.CDLL]:
    global _JLIB, _JTRIED
    if _JTRIED:
        return _JLIB
    _JTRIED = True
    if os.environ.get("GDT_NATIVE_LOADER", "1") == "0":
        return None
    so = os.path.join(_native_dir(), "libjpegdec.so")
    if not os.path.exists(so):
        load_lib()  # one `make -C native` builds both libraries
        if not os.path.exists(so):  # no libjpeg headers on this host
            logging.warning("native jpegdec unavailable; using PIL full decode")
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logging.warning("native jpegdec load failed (%s); using PIL path", e)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    ip = ctypes.POINTER(ctypes.c_int)
    lib.gdt_jpeg_dims.argtypes = [u8p, ctypes.c_long, ip, ip]
    lib.gdt_jpeg_dims.restype = i
    lib.gdt_jpeg_region.argtypes = [u8p, ctypes.c_long, i, i, i, i, u8p]
    lib.gdt_jpeg_region.restype = i
    _JLIB = lib
    return _JLIB


def jpeg_region(
    data: np.ndarray, x1: int, y1: int, w: int, h: int
) -> Optional[np.ndarray]:
    """Decode the [x1, y1, x1+w, y1+h) window of an in-memory JPEG.

    Decodes only the window's iMCU rows/columns (bit-identical to a full
    decode + crop; skips the IDCT/upsample/color work everywhere else and the
    entropy decode below the window — native/jpegdec.cpp). Out-of-frame
    pixels are zero (PIL crop semantics). Returns (h, w, 3) uint8, or None if
    the native lib is absent or the stream is not decodable here.
    """
    lib = load_jpeg_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.gdt_jpeg_region(data, data.size, x1, y1, w, h, out)
    return out if rc == 0 else None


def jpeg_region_file(path: str, x1: int, y1: int, w: int, h: int) -> Optional[np.ndarray]:
    if load_jpeg_lib() is None:
        return None
    try:
        data = np.fromfile(path, np.uint8)
    except OSError:
        return None
    return jpeg_region(data, x1, y1, w, h)
