"""PatchMatch stereo pipeline: slanted-plane propagation + post-process.

Pipeline equivalent of the reference's PatchMatchStereoGPU entry
(src/PatchMatchStereoGPU.cu:2602-3023) with the CPU pm::PatchMatch
post-processing chain (the GPU one is compiled out at .cu:2839-2858):
LR validity <= 1px (pm.cpp:536-546), nearest-valid fill, color-weighted
median over invalidated pixels (pm.cpp:396-435 / .cu:2436-2600).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import PatchMatchConfig, WeightedMedianConfig
from ..ops.patchmatch import patchmatch_stereo, plane_fill_occluded
from ..ops.postprocess import lr_occlusion_mask, weighted_median

__all__ = ["patchmatch_pipeline", "PatchMatchOutput"]


class PatchMatchOutput(NamedTuple):
    left_disp: jax.Array
    right_disp: jax.Array
    left_raw: jax.Array
    right_raw: jax.Array


def patchmatch_pipeline(
    key: jax.Array,
    left_bgr: jax.Array,
    right_bgr: jax.Array,
    cfg: PatchMatchConfig = PatchMatchConfig(),
    median_cfg: WeightedMedianConfig = WeightedMedianConfig(),
    postprocess: bool = True,
) -> PatchMatchOutput:
    left_bgr = left_bgr.astype(jnp.float32)
    right_bgr = right_bgr.astype(jnp.float32)
    left, right, _, _ = patchmatch_stereo(key, left_bgr, right_bgr, cfg)
    dl_raw, dr_raw = left.d, right.d
    dl, dr = dl_raw, dr_raw
    if postprocess:
        occ_l = lr_occlusion_mask(dl, dr, -1, cfg.max_disp, cfg.min_disp)
        occ_r = lr_occlusion_mask(dr, dl, +1, cfg.max_disp, cfg.min_disp)
        # fill with extended PLANES, lower disparity wins (pm.cpp:367-392)
        dl = plane_fill_occluded(left, ~occ_l)
        dr = plane_fill_occluded(right, ~occ_r)
        # weighted median over the filled-in pixels only (the reference's
        # occluded-only 21x21 color-weighted median, .cu:2453-2463);
        # gamma=0.1 branch since images are in [0, 255] (.cu:2474)
        dl = weighted_median(dl, left_bgr, occ_l, median_cfg, normalized_intensity=False)
        dr = weighted_median(dr, right_bgr, occ_r, median_cfg, normalized_intensity=False)
    return PatchMatchOutput(dl, dr, dl_raw, dr_raw)
