"""Stereo3DMST pipeline: segment-tree aggregation with 3D plane labels.

TPU-native equivalent of the reference's `stereo3dmst` entry point
(src/Stereo3DMST.cpp:714-912, call stack SURVEY.md §3.2):

  1. median-blur the color channels (3x3, ref :226-228), build 4-neighbor
     L1 color edge weights (:242-282);
  2. Felzenszwalb segmentation + small-component merge + per-component MST
     forest — on the HOST via the native C++ builder (native/treebuild.cpp),
     which also emits the Euler-tour arrays the TPU tree filter needs;
  3. 100 iterations of MST_PMS plane-label optimization for each view —
     on TPU, all trees and candidates batched (ops/mst.py);
  4. disparity from labels, clamp01 * (Dmax-1) (:189-201, :900-902), then
     left-right consistency check without fill (:904).

The matching cost is any (H, W, D) cost volume: the mc-cnn file format the
reference consumes (io/costvolume.py) or one built by this framework's own
cost layer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MSTConfig
from ..native import build_forest, color_edge_weights
from ..ops.filters import median3x3
from ..ops.mst import (
    forest_arrays,
    labels_to_disparity,
    mst_pms_optimize,
)
from ..ops.postprocess import lr_consistency

__all__ = ["mst_stereo", "MSTOutput", "build_view_forest"]


class MSTOutput(NamedTuple):
    left_disp: jax.Array
    right_disp: jax.Array
    left_valid: jax.Array


def build_view_forest(bgr: np.ndarray, cfg: MSTConfig):
    """Host-side forest construction for one view (steps 1-2 above)."""
    img = jnp.asarray(np.asarray(bgr, np.float32))
    if cfg.median_prefilter:
        img = median3x3(img)
    wr, wd = color_edge_weights(np.asarray(img))
    forest = build_forest(
        wr, wd, cfg.c, cfg.min_cc_size, cfg.gamma, cfg.max_log_range
    )
    return forest_arrays(forest)


def mst_stereo(
    left_bgr,
    right_bgr,
    left_vol,
    right_vol,
    cfg: MSTConfig = MSTConfig(),
    seed: int = 0,
    max_neighbors: int = 8,
) -> MSTOutput:
    """Run the full 3DMST pipeline on a rectified pair + cost volumes.

    left_vol/right_vol: (H, W, D) float32 matching costs (lower = better),
    e.g. a cleaned mc-cnn volume (io.costvolume.clean_mccnn). Returns
    disparities in pixels (max at cfg.max_disp - 1), LR-checked left view.
    """
    fa_l = build_view_forest(left_bgr, cfg)
    fa_r = build_view_forest(right_bgr, cfg)
    key = jax.random.PRNGKey(seed)
    kl, kr = jax.random.split(key)

    a, b, c, _ = mst_pms_optimize(
        kl, jnp.asarray(left_vol), fa_l, cfg, max_neighbors=max_neighbors
    )
    disp_l = labels_to_disparity(a, b, c, fa_l, cfg.max_disp) * (cfg.max_disp - 1.0)

    a, b, c, _ = mst_pms_optimize(
        kr, jnp.asarray(right_vol), fa_r, cfg, max_neighbors=max_neighbors
    )
    disp_r = labels_to_disparity(a, b, c, fa_r, cfg.max_disp) * (cfg.max_disp - 1.0)

    disp_l_checked, valid = lr_consistency(
        disp_l, disp_r, float(cfg.max_disp), fill=False
    )
    return MSTOutput(disp_l_checked, disp_r, valid)
