"""Point-cloud export (PLY / PCD writers).

Replaces the reference's interactive PCL viewers and savePCDFileASCII
(src/stereo_opencv.cpp:182-220, stereo_Yin.cpp:223-257, and saveXYZ in
`stereo_opencv (copy).cpp:29-45`) with file outputs. Supports the same
z-filtering the viewers applied (|z| < z_max, stereo_opencv.cpp:190).
"""

from __future__ import annotations

import numpy as np

__all__ = ["filter_cloud", "save_ply", "save_pcd", "save_xyz"]


def filter_cloud(
    xyz: np.ndarray,
    rgb: np.ndarray | None = None,
    z_max: float | None = None,
    max_abs: float = 1e4,
):
    """Flatten an (H, W, 3) reprojection into an (N, 3) cloud, dropping
    non-finite points, |coord| >= max_abs (OpenCV missing-disparity big
    values) and optionally |z| >= z_max."""
    pts = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
    cols = None if rgb is None else np.asarray(rgb).reshape(-1, 3)
    keep = np.isfinite(pts).all(axis=1) & (np.abs(pts) < max_abs).all(axis=1)
    if z_max is not None:
        keep &= np.abs(pts[:, 2]) < z_max
    pts = pts[keep]
    if cols is not None:
        cols = cols[keep]
    return pts, cols


def save_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    pts = np.asarray(points, dtype=np.float32)
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if colors is None:
            for p in pts:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        else:
            cols = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")


def save_pcd(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """ASCII PCD v0.7 (the format pcl::io::savePCDFileASCII writes,
    ref call: src/stereo_opencv.cpp:219)."""
    pts = np.asarray(points, dtype=np.float32)
    n = len(pts)
    with_rgb = colors is not None
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        if with_rgb:
            f.write("FIELDS x y z rgb\nSIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n")
        else:
            f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n")
        f.write(f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {n}\nDATA ascii\n")
        if with_rgb:
            cols = np.clip(np.asarray(colors), 0, 255).astype(np.uint32)
            packed = (cols[:, 0] << 16) | (cols[:, 1] << 8) | cols[:, 2]
            rgbf = packed.view(np.float32) if packed.dtype == np.uint32 else packed
            rgbf = packed.astype(np.uint32).view(np.float32)
            for p, c in zip(pts, rgbf):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c:.9e}\n")
        else:
            for p in pts:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def save_xyz(path: str, points: np.ndarray) -> None:
    """Plain whitespace XYZ (ref: saveXYZ, `stereo_opencv (copy).cpp:29-45`)."""
    pts = np.asarray(points, dtype=np.float32)
    with open(path, "w") as f:
        for p in pts:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
