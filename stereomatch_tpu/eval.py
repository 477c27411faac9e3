"""Disparity evaluation metrics + golden comparison helpers.

The reference has no quantitative evaluation (SURVEY.md §4 — imshow and
timing prints only); its committed `build/left_disparity.png` /
`right_disparity.png` act as informal goldens. This module provides the
metrics the new framework is judged by (BASELINE.md): bad-pixel rates,
KITTI D1-all, end-point error, plus loaders for golden PNGs and
KITTI-format disparity maps.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bad_pixel_rate",
    "d1_all",
    "epe",
    "disparity_metrics",
    "load_golden_png",
    "load_kitti_disparity",
    "load_middlebury_pfm",
    "save_middlebury_pfm",
]


def _masked(est, gt, valid):
    est = np.asarray(est, np.float32)
    gt = np.asarray(gt, np.float32)
    if valid is None:
        valid = np.isfinite(gt) & (gt > 0)
    return est[valid], gt[valid]


def bad_pixel_rate(est, gt, threshold: float = 1.0, valid=None) -> float:
    """Fraction of valid pixels with |est - gt| > threshold."""
    e, g = _masked(est, gt, valid)
    if e.size == 0:
        return 0.0
    return float((np.abs(e - g) > threshold).mean())


def d1_all(est, gt, valid=None) -> float:
    """KITTI D1-all: err > 3 px AND err > 5% of gt."""
    e, g = _masked(est, gt, valid)
    if e.size == 0:
        return 0.0
    err = np.abs(e - g)
    return float(((err > 3.0) & (err > 0.05 * np.abs(g))).mean())


def epe(est, gt, valid=None) -> float:
    """Mean end-point error over valid pixels."""
    e, g = _masked(est, gt, valid)
    if e.size == 0:
        return 0.0
    return float(np.abs(e - g).mean())


def disparity_metrics(est, gt, valid=None) -> dict:
    return {
        "epe": epe(est, gt, valid),
        "bad1": bad_pixel_rate(est, gt, 1.0, valid),
        "bad2": bad_pixel_rate(est, gt, 2.0, valid),
        "bad3": bad_pixel_rate(est, gt, 3.0, valid),
        "d1_all": d1_all(est, gt, valid),
    }


def load_golden_png(path: str, scale: float = 1.0) -> np.ndarray:
    """8-bit golden disparity PNG (the reference's build artifacts,
    written by src/stereo_opencv.cpp:167-168). Values are raw 8-bit
    disparities times an unknown display scale; pass `scale` to undo it."""
    from PIL import Image

    img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32) * scale


def load_kitti_disparity(path: str) -> tuple[np.ndarray, np.ndarray]:
    """KITTI disp_occ/disp_noc format: uint16 PNG, disparity = value/256,
    0 = invalid. Returns (disparity, valid_mask)."""
    from PIL import Image

    raw = np.asarray(Image.open(path)).astype(np.float32)
    valid = raw > 0
    return raw / 256.0, valid


def load_middlebury_pfm(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Middlebury ground-truth disparity (.pfm, grayscale float): header
    'Pf', 'W H', scale (sign = endianness), rows bottom-to-top. Invalid
    pixels are inf. Returns (disparity, valid_mask)."""
    with open(path, "rb") as f:
        if f.readline().strip() not in (b"Pf",):
            raise ValueError(f"{path}: not a grayscale PFM")
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        dtype = "<f4" if scale < 0 else ">f4"
        data = np.frombuffer(f.read(4 * w * h), dtype=dtype).reshape(h, w)
    disp = np.flipud(data).astype(np.float32)  # PFM rows are bottom-up
    valid = np.isfinite(disp) & (disp > 0)
    return disp, valid


def save_middlebury_pfm(path: str, disp: np.ndarray) -> None:
    """Write a grayscale little-endian PFM (inf = invalid)."""
    disp = np.asarray(disp, np.float32)
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{disp.shape[1]} {disp.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.flipud(disp).astype("<f4").tobytes())
