"""Host-side image I/O: grayscale decode, scaling, float TIFF read/write.

The reference decodes on the CPU with ``cv::imread(IMREAD_GRAYSCALE)`` and
scales with ``cv::resize`` (src/optflow.cpp:106-125) before uploading to the
GPU; flow/map outputs are written as one float32 TIFF per component
(src/optflow.cpp:478-484). Here decode/resize stay on the host (cv2 when
present, PIL fallback) and the device side consumes float32 arrays in the
0..255 intensity range (OpenCV convention, no normalization).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:  # cv2 is present in this environment; PIL is the fallback.
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


class ImageReadError(RuntimeError):
    """Raised when an image fails to decode (bad/missing file).

    The reference logs and skips the pair (src/optflow.cpp:108-112,120-124);
    the engine catches this and does the same.
    """


def read_gray(path: str) -> np.ndarray:
    """Read an image as uint8 grayscale (ref: cv::imread IMREAD_GRAYSCALE)."""
    if _HAS_CV2:
        im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if im is None or im.size == 0:
            raise ImageReadError(path)
        return im
    try:
        with Image.open(path) as pim:
            return np.asarray(pim.convert("L"))
    except (OSError, ValueError) as e:  # pragma: no cover
        raise ImageReadError(path) from e


def resize_scale(im: np.ndarray, scale: float) -> np.ndarray:
    """Uniform rescale with bilinear sampling (ref: cv::resize default
    INTER_LINEAR, src/optflow.cpp:113,125). ``scale == 1`` is a no-op."""
    if scale == 1:
        return im
    if _HAS_CV2:
        return cv2.resize(im, None, fx=scale, fy=scale)
    h, w = im.shape[:2]
    new_w = int(round(w * scale))
    new_h = int(round(h * scale))
    with Image.fromarray(im) as pim:
        return np.asarray(pim.resize((new_w, new_h), Image.BILINEAR))


def read_gray_scaled(path: str, scale: float) -> np.ndarray:
    """Decode + rescale, returned as float32 (0..255)."""
    return resize_scale(read_gray(path), scale).astype(np.float32)


def write_float_tiff(path: str, arr: np.ndarray) -> None:
    """Write a float32 single-channel TIFF (ref: cv::imwrite of CV_32FC1,
    src/optflow.cpp:482-483)."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if _HAS_CV2:
        ok = cv2.imwrite(path, arr)
        if not ok:
            raise OSError(f"failed to write {path}")
        return
    Image.fromarray(arr, mode="F").save(path)


def read_float_tiff(path: str) -> np.ndarray:
    """Read a float32 TIFF written by :func:`write_float_tiff` (or the
    reference binary)."""
    if _HAS_CV2:
        arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if arr is None:
            raise ImageReadError(path)
        return arr.astype(np.float32)
    with Image.open(path) as pim:
        return np.asarray(pim, dtype=np.float32)


def pad_to(im: np.ndarray, shape: Tuple[int, int], fill: float = 0.0) -> np.ndarray:
    """Zero-pad an image up to ``shape`` (static-shape bucketing helper).

    Padding with 0 composes with the reference's <=1.0-intensity background
    masking (src/optflow.cpp:467-473): padded pixels are masked out exactly
    like resin background.
    """
    h, w = im.shape[:2]
    th, tw = shape
    if h == th and w == tw:
        return im
    out = np.full((th, tw), fill, dtype=im.dtype)
    out[:h, :w] = im
    return out
