"""Streaming-sequence app: the FLIR series processed data-parallel.

The reference processes one hard-coded frame per run (stereo_opencv.cpp
loads a single id). This app runs the whole bundled sequence
(ids 20, 40, 60, 61, 80) through the SPMD cost-volume pipeline with frames
data-parallel over the mesh's "frame" axis and rows tiled over "tile"
(SURVEY.md §5 streaming-video config; DCN would distribute frames across
hosts on a real pod).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import CostVolumeConfig, CostVolumePipelineConfig, GuidedFilterConfig
from ..geometry import rectified_geometry, remap_bilinear
from ..io import load_image, load_stereo_calibration, save_disparity_png
from ..utils import StageTimer

DEFAULT_IDS = (20, 40, 60, 61, 80)


def run(
    data_dir: str,
    calib: str,
    out_dir: str,
    ids=DEFAULT_IDS,
    scale: float = 0.25,
    max_disp: int = 63,
    n_frame: int | None = None,
    verbose: bool = True,
    resume: bool = False,
):
    """resume=True skips frames whose output PNG already exists — the
    streaming checkpoint/restart story (the per-frame artifacts ARE the
    checkpoints; a killed run restarts where it stopped). The reference
    has no recovery at all (SURVEY §5)."""
    import jax
    import jax.numpy as jnp

    from ..parallel import make_mesh
    from ..parallel.tiled import tiled_cost_volume_batch

    timer = StageTimer(verbose=verbose)
    if resume:
        os.makedirs(out_dir, exist_ok=True)
        remaining = [
            fid for fid in ids
            if not os.path.exists(os.path.join(out_dir, f"stream_disp_{fid:06d}.png"))
        ]
        if verbose and len(remaining) < len(ids):
            print(f"resume: {len(ids) - len(remaining)} frames already done")
        ids = tuple(remaining)
        if not ids:
            return np.zeros((0,), np.float32)
    step = int(round(1.0 / scale))
    pairs = []
    for fid in ids:
        l = load_image(os.path.join(data_dir, f"{fid:06d}_191400042.jpg"))[::step, ::step]
        r = load_image(os.path.join(data_dir, f"{fid:06d}_191400039.jpg"))[::step, ::step]
        pairs.append((l, r))
    h, w = pairs[0][0].shape[:2]

    cal = load_stereo_calibration(calib).rescaled(scale)
    geom = rectified_geometry(cal, (w, h))
    m1x, m1y = jnp.asarray(geom.map1x), jnp.asarray(geom.map1y)
    m2x, m2y = jnp.asarray(geom.map2x), jnp.asarray(geom.map2y)

    with timer.stage("rectify batch"):
        lefts = np.stack(
            [np.asarray(remap_bilinear(jnp.asarray(l.astype(np.float32)), m1x, m1y)) for l, _ in pairs]
        )
        rights = np.stack(
            [np.asarray(remap_bilinear(jnp.asarray(r.astype(np.float32)), m2x, m2y)) for _, r in pairs]
        )

    devices = jax.devices()
    if len(devices) < 2:
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            pass
    nf = n_frame or max(1, min(len(ids), len(devices) // 2))
    nt = max(1, len(devices) // nf)
    mesh = make_mesh(n_tile=nt, n_frame=nf, devices=devices[: nf * nt])
    if verbose:
        print(f"mesh: frame={nf} x tile={nt} over {nf * nt} devices")

    cfg = CostVolumePipelineConfig(
        volume=CostVolumeConfig(min_disp=0, max_disp=max_disp),
        guided=GuidedFilterConfig(slab=16),
    )
    fn = tiled_cost_volume_batch(mesh, cfg)

    # pad the batch to a multiple of the frame axis; rows to tile multiple
    b = lefts.shape[0]
    pad_b = (-b) % nf
    pad_h = (-h) % nt
    lb = np.pad(lefts[..., ::-1], ((0, pad_b), (0, pad_h), (0, 0), (0, 0)))
    rb = np.pad(rights[..., ::-1], ((0, pad_b), (0, pad_h), (0, 0), (0, 0)))

    with timer.stage("pipeline batch"):
        dl, dr = fn(lb, rb)
        dl = np.asarray(dl)[:b, :h]

    os.makedirs(out_dir, exist_ok=True)
    for fid, disp in zip(ids, dl):
        save_disparity_png(
            os.path.join(out_dir, f"stream_disp_{fid:06d}.png"), disp, max_disp
        )
    if verbose:
        print(timer.report())
        print(f"wrote {len(ids)} disparity maps to {out_dir}")
    return dl


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="/root/reference/build")
    ap.add_argument("--calib", default="/root/reference/cam_stereo_pheno.yml")
    ap.add_argument("--out-dir", default="./out")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--max-disp", type=int, default=63)
    ap.add_argument("--resume", action="store_true",
                    help="skip frames whose output already exists")
    a = ap.parse_args()
    run(a.data_dir, a.calib, a.out_dir, scale=a.scale, max_disp=a.max_disp,
        resume=a.resume)


if __name__ == "__main__":
    main()
