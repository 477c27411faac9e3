"""StereoTest equivalent: FLIR pair -> rectify -> SGBM -> 3D point cloud.

Mirrors src/stereo_opencv.cpp:47-225: loads the stereo pair by frame id
(cameras 191400042=left, 191400039=right), rectifies with the bundled
calibration (cam_stereo_pheno.yml), runs SGBM (numDisparities=16*16,
MODE_HH — StereoMatching.cpp:148-193 via stereo_opencv.cpp:150), reprojects
with Q, and writes the |Z| < z_clip cloud (the PCL viewer + test.pcd at
stereo_opencv.cpp:182-220 become PLY/PCD files).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import SGBMConfig
from ..geometry import rectified_geometry, remap_bilinear, reproject_image_to_3d
from ..io import (
    filter_cloud,
    load_image,
    load_stereo_calibration,
    save_disparity_png,
    save_pcd,
)
from ..utils import StageTimer


def run(
    data_dir: str,
    frame_id: int,
    calib: str,
    out_dir: str,
    num_disp_factor: int = 16,
    scale: float = 1.0,
    z_clip: float = 0.8,
    verbose: bool = True,
):
    import jax.numpy as jnp

    timer = StageTimer(verbose=verbose)
    left = load_image(os.path.join(data_dir, f"{frame_id:06d}_191400042.jpg"))
    right = load_image(os.path.join(data_dir, f"{frame_id:06d}_191400039.jpg"))
    if scale != 1.0:
        step = int(round(1.0 / scale))
        left, right = left[::step, ::step], right[::step, ::step]
    h, w = left.shape[:2]

    cal = load_stereo_calibration(calib)
    if scale != 1.0:
        cal = cal.rescaled(scale)
    geom = rectified_geometry(cal, (w, h))

    mx1, my1 = jnp.asarray(geom.map1x), jnp.asarray(geom.map1y)
    mx2, my2 = jnp.asarray(geom.map2x), jnp.asarray(geom.map2y)
    with timer.stage("rectify"):
        rl = remap_bilinear(jnp.asarray(left.astype(np.float32)), mx1, my1)
        rr = remap_bilinear(jnp.asarray(right.astype(np.float32)), mx2, my2)

    gray_l = 0.299 * rl[..., 0] + 0.587 * rl[..., 1] + 0.114 * rl[..., 2]
    gray_r = 0.299 * rr[..., 0] + 0.587 * rr[..., 1] + 0.114 * rr[..., 2]

    from ..ops.sgbm import sgbm_disparity

    cfg = SGBMConfig(min_disp=16, num_disp=16 * num_disp_factor)
    with timer.stage("sgbm"):
        out = sgbm_disparity(gray_l, gray_r, cfg)
    disp = np.asarray(out.disparity)

    with timer.stage("reproject"):
        xyz = np.asarray(reproject_image_to_3d(jnp.asarray(disp), geom.Q))

    os.makedirs(out_dir, exist_ok=True)
    save_disparity_png(os.path.join(out_dir, f"disp_{frame_id:06d}.png"), disp)
    pts, cols = filter_cloud(xyz, np.asarray(rl), z_max=z_clip)
    save_pcd(os.path.join(out_dir, f"cloud_{frame_id:06d}.pcd"), pts, cols)
    if verbose:
        print(timer.report())
        print(f"wrote {out_dir}/disp_{frame_id:06d}.png and cloud ({len(pts)} pts)")
    return disp, xyz


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="/root/reference/build")
    ap.add_argument("--id", type=int, default=20)
    ap.add_argument(
        "--calib", default="/root/reference/cam_stereo_pheno.yml"
    )
    ap.add_argument("--out-dir", default="./out")
    ap.add_argument("--num-disp-factor", type=int, default=16,
                    help="numDisparities = 16 * factor (ref uses 16)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--z-clip", type=float, default=0.8)
    a = ap.parse_args()
    run(a.data_dir, a.id, a.calib, a.out_dir, a.num_disp_factor, a.scale, a.z_clip)


if __name__ == "__main__":
    main()
