"""SGBM + 3DMST: the north-star composition as one pipeline.

BASELINE.md's headline target is end-to-end SGBM+3DMST throughput. The
reference runs them as two unrelated programs (StereoTest's SGBM,
src/StereoMatching.cpp:148-193, and StereoYin's 3DMST,
src/stereo_Yin.cpp:207 -> src/Stereo3DMST.cpp:714-912) — the 3DMST always
starts from random planes and burns 100 full-ladder iterations
(:858-889). Here the composition is an actual pipeline: the SGBM
disparity that the target workload computes anyway becomes the 3DMST
plane-label seed (ops/mst.py::plane_labels_from_disparity), so label
optimization degenerates to a short refinement phase with a truncated
annealed ladder (models/mst.py::mst_stereo_seeded) — measured on the GT
battery and the FLIR curve to match the flat-run plateau at a fraction
of the tree-filter bytes (PARITY.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MSTConfig, SGBMConfig
from ..ops.postprocess import nearest_valid_fill
from ..ops.sgbm import sgbm_disparity
from .mst import MSTOutput, mst_stereo_seeded

__all__ = [
    "sgbm_seed_disparities",
    "sgbm_mst_stereo",
    "sgbm_mst_stereo_fused",
    "mst_stereo_temporal_fused",
    "sgbm_mst_video",
]


def _gray_from_bgr(bgr) -> jax.Array:
    # jnp-only (no host round-trip): also called under jit by the fused
    # frame program
    arr = jnp.asarray(bgr, jnp.float32)
    if arr.ndim == 2:
        return arr
    # BT.601 luma on BGR channel order
    return 0.114 * arr[..., 0] + 0.587 * arr[..., 1] + 0.299 * arr[..., 2]


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "right_seed"))
def _seed_pair(gl: jax.Array, gr: jax.Array, cfg: SGBMConfig,
               right_seed: str = "disp2"):
    """LEFT- and RIGHT-view SGBM disparities, invalids filled.

    right_seed="disp2" (default): the right map is OpenCV's disp2 —
    min-cost projection of the SAME aggregated volume, which the disp12
    cross-check builds anyway (ops/sgbm.py) — so the second view's seed
    is FREE. Integer-valued with occlusion holes; the nearest-valid fill
    + plane_labels_from_disparity's box smoothing absorb both, and the
    MST refinement repairs far worse seeds (PARITY.md degraded-seed
    table).

    right_seed="mirror": a second full SGBM on the horizontally mirrored
    swapped pair (right-image pixel x matches left-image pixel x + d, so
    after mirroring both images it IS the left-view problem and
    d_R(x, y) = d_mirror(W-1-x, y)) — subpixel right map at ~2x the SGBM
    cost."""
    out_l = sgbm_disparity(gl, gr, cfg)
    dl = nearest_valid_fill(out_l.disparity, out_l.valid)
    if right_seed == "disp2" and out_l.right_disparity is not None:
        rd = out_l.right_disparity
        dr = nearest_valid_fill(rd, rd > cfg.min_disp - 0.5)
    elif right_seed in ("mirror", "disp2"):
        out_r = sgbm_disparity(gr[:, ::-1], gl[:, ::-1], cfg)
        dr = nearest_valid_fill(out_r.disparity, out_r.valid)[:, ::-1]
    else:
        raise ValueError(f"right_seed must be 'disp2' or 'mirror', got {right_seed!r}")
    return dl, dr


def sgbm_seed_disparities(left_bgr, right_bgr, cfg: SGBMConfig,
                          right_seed: str = "disp2"):
    """(left, right) filled SGBM disparity maps in pixels."""
    return _seed_pair(
        _gray_from_bgr(left_bgr), _gray_from_bgr(right_bgr), cfg, right_seed
    )


def sgbm_mst_stereo(
    left_bgr,
    right_bgr,
    left_vol,
    right_vol,
    cfg: MSTConfig = MSTConfig(),
    sgbm_cfg: SGBMConfig | None = None,
    seed: int = 0,
    fine_iterations: int | None = None,
    refine_start: float | None = 2.0,
    max_neighbors: int = 2,
    right_seed: str = "disp2",
) -> MSTOutput:
    """End-to-end SGBM+3DMST on a rectified pair + (H, W, D) cost volumes.

    Runs SGBM once; the right-view seed comes free from its disp2
    projection (right_seed="disp2", default) or from a second mirrored
    SGBM pass ("mirror"). Invalid pixels fill with the reference's
    nearest-valid rule, the maps are plane-fit into per-node seeds, and a
    short truncated-ladder 3DMST run refines them. Same output contract
    as mst_stereo.

    max_neighbors defaults to 2 (not the random-init path's 8): with a
    good seed the neighbor-tree candidates mostly re-propose what the
    seed already encodes, and the measured quality at mn=2 is equal or
    BETTER at half/VGA GT scale and on the rectified FLIR pair (PARITY.md
    production-config table) at ~2/3 of the per-iteration bytes. Pair
    with config.production_mst_config for the full measured recipe.
    """
    if sgbm_cfg is None:
        # SGBM's disparity range must cover the MST label range; OpenCV's
        # surface requires num_disp % 16 == 0
        sgbm_cfg = _default_sgbm_cfg(cfg)
    dl, dr = sgbm_seed_disparities(left_bgr, right_bgr, sgbm_cfg, right_seed)
    span = float(cfg.max_disp - 1)
    dl = jnp.clip(dl, 0.0, span)
    dr = jnp.clip(dr, 0.0, span)
    return mst_stereo_seeded(
        left_bgr, right_bgr, left_vol, right_vol, dl, dr, cfg,
        seed=seed, fine_iterations=fine_iterations,
        refine_start=refine_start, max_neighbors=max_neighbors,
    )


def _default_sgbm_cfg(cfg: MSTConfig) -> SGBMConfig:
    nd = -(-cfg.max_disp // 16) * 16
    # The seed pass inherits the MST volume dtype: with the production
    # bf16 volume the SGBM aggregation also runs bf16 — D1 vs f32 =
    # 0.000 at depth 128 (tests/test_sgbm.py bf16 gates) and the MST
    # refinement repairs far coarser seeds than tie-level drift
    # (PARITY.md degraded-seed table). Halves the SGBM stage's bytes
    # and its ~6.5 GB staged-chain peak, and makes the pipeline match
    # the headline model (which prices the SGBM term at the bf16
    # roofline). Default f32 MSTConfig keeps the exact f32 seed.
    dt = "bfloat16" if cfg.volume_dtype == "bfloat16" else "float32"
    return SGBMConfig(min_disp=0, num_disp=nd, block_size=5, cost_dtype=dt)


def sgbm_mst_stereo_fused(
    left_bgr,
    right_bgr,
    left_vol,
    right_vol,
    cfg: MSTConfig = MSTConfig(),
    sgbm_cfg: SGBMConfig | None = None,
    seed: int = 0,
    fine_iterations: int = 4,
    refine_start: float | None = 2.0,
    max_neighbors: int = 2,
    right_seed: str = "disp2",
) -> MSTOutput:
    """The ENTIRE north-star composition as ONE jitted XLA program:
    SGBM on both views (mirror trick), nearest-valid fill, plane-fit
    seeding, median prefilter + edge weights + on-device forest
    construction (ops/device_forest.py), every truncated-ladder label
    iteration, and the disparity maps of both views — zero host
    round-trips anywhere in the frame. The reference's equivalent is two
    separate executables with a per-frame CPU graph build in between
    (src/StereoMatching.cpp:148-193, src/Stereo3DMST.cpp:841-889).

    Same RNG stream as sgbm_mst_stereo with forest_backend="device"
    (parity: tests/test_mst_seeded.py)."""
    from .mst import _fused_capacities

    h, w = int(np.asarray(left_bgr).shape[0]), int(np.asarray(left_bgr).shape[1])
    if sgbm_cfg is None:
        sgbm_cfg = _default_sgbm_cfg(cfg)
    tmax, adj_cap = _fused_capacities(h, w, cfg)
    key = jax.random.PRNGKey(seed)
    disp_l, disp_r = _sgbm_mst_frame_fused(
        jnp.asarray(np.asarray(left_bgr, np.float32)),
        jnp.asarray(np.asarray(right_bgr, np.float32)),
        jnp.asarray(left_vol),
        jnp.asarray(right_vol),
        key, cfg, sgbm_cfg, fine_iterations, refine_start,
        max_neighbors, h, w, tmax, adj_cap, right_seed,
    )
    from .mst import _apply_smoothness
    from ..ops.postprocess import lr_consistency

    disp_l = _apply_smoothness(disp_l, left_bgr, cfg)
    disp_r = _apply_smoothness(disp_r, right_bgr, cfg)
    disp_l_checked, valid = lr_consistency(
        disp_l, disp_r, float(cfg.max_disp), fill=False
    )
    return MSTOutput(disp_l_checked, disp_r, valid)


def _view_forest(bgr, cfg: MSTConfig, tmax: int, adj_cap: int):
    """Median prefilter + edge weights + on-device forest build for one
    view (jit-traceable). Returns build_forest_device's raw array dict —
    a pytree of device arrays, so it can cross executable boundaries
    (the video server chains the KEYFRAME's forests into the temporal
    refine program when reuse_forest is on)."""
    from ..ops.device_forest import build_forest_device
    from ..ops.filters import median3x3

    img = median3x3(bgr) if cfg.median_prefilter else bgr
    im = img if img.ndim == 3 else img[..., None]
    wr = jnp.sum(jnp.abs(im[:, 1:] - im[:, :-1]), axis=-1)
    wd = jnp.sum(jnp.abs(im[1:] - im[:-1]), axis=-1)
    return build_forest_device(
        wr, wd, c=cfg.c, min_size=cfg.min_cc_size, gamma=cfg.gamma,
        delta=cfg.max_log_range, tmax=tmax, adj_cap=adj_cap,
    )


def _refine_view_given_forest(
    raw, vol, seed_disp, k, cfg: MSTConfig, h: int, w: int, tmax: int,
    fine_iterations: int, refine_start, max_neighbors: int,
):
    """Plane-fit seeding + truncated-ladder label refinement on an
    ALREADY-BUILT forest (raw = build_forest_device output, possibly a
    previous keyframe's — segmentation drifts slowly, GT-sequence-gated
    in tests/test_serving.py)."""
    from ..ops.device_forest import device_forest_arrays
    from ..ops.mst import (
        labels_to_disparity,
        mst_pms_optimize,
        plane_labels_from_disparity,
    )
    from .mst import _seed_min_cost

    span = float(cfg.max_disp - 1)
    if vol.dtype != jnp.dtype(cfg.volume_dtype):
        vol = vol.astype(cfg.volume_dtype)
    fa = device_forest_arrays(raw, h, w, tmax=tmax, check=False)
    a0, b0, c0 = plane_labels_from_disparity(
        jnp.clip(seed_disp, 0.0, span), fa
    )
    mc0 = _seed_min_cost(vol, a0, b0, c0, fa, cfg)
    a, b, c, _ = mst_pms_optimize(
        k, vol, fa, cfg, max_neighbors=max_neighbors,
        iterations=fine_iterations, init_state=(a0, b0, c0, mc0),
        refine_start=refine_start,
    )
    return labels_to_disparity(a, b, c, fa, cfg.max_disp) * span


def _fused_refine_view(
    bgr, vol, seed_disp, k, cfg: MSTConfig, h: int, w: int, tmax: int,
    adj_cap: int, fine_iterations: int, refine_start, max_neighbors: int,
):
    """One view of the fused frame program: forest build + plane-fit
    seeding + truncated-ladder label refinement — shared by the
    SGBM-seeded and the temporal (video) frame programs."""
    raw = _view_forest(bgr, cfg, tmax, adj_cap)
    return _refine_view_given_forest(
        raw, vol, seed_disp, k, cfg, h, w, tmax,
        fine_iterations, refine_start, max_neighbors,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "sgbm_cfg", "fine_iterations", "refine_start",
        "max_neighbors", "h", "w", "tmax", "adj_cap", "right_seed",
    ),
)
def _sgbm_mst_frame_fused(
    left_bgr, right_bgr, left_vol, right_vol, key, cfg: MSTConfig,
    sgbm_cfg: SGBMConfig, fine_iterations: int, refine_start,
    max_neighbors: int, h: int, w: int, tmax: int, adj_cap: int,
    right_seed: str = "disp2",
):
    gl = _gray_from_bgr(left_bgr)
    gr = _gray_from_bgr(right_bgr)
    seed_l, seed_r = _seed_pair(gl, gr, sgbm_cfg, right_seed)
    kl, kr = jax.random.split(key)
    disp_l = _fused_refine_view(
        left_bgr, left_vol, seed_l, kl, cfg, h, w, tmax, adj_cap,
        fine_iterations, refine_start, max_neighbors,
    )
    disp_r = _fused_refine_view(
        right_bgr, right_vol, seed_r, kr, cfg, h, w, tmax, adj_cap,
        fine_iterations, refine_start, max_neighbors,
    )
    return disp_l, disp_r


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "fine_iterations", "refine_start", "max_neighbors",
        "h", "w", "tmax", "adj_cap",
    ),
)
def _mst_refine_frame_fused(
    left_bgr, right_bgr, left_vol, right_vol, seed_l, seed_r, key,
    cfg: MSTConfig, fine_iterations: int, refine_start,
    max_neighbors: int, h: int, w: int, tmax: int, adj_cap: int,
):
    """The steady-state VIDEO frame program: identical to
    _sgbm_mst_frame_fused except the seed disparities arrive as inputs
    (the previous frame's refined maps) instead of an in-program SGBM
    pass — the whole SGBM stage drops out of the per-frame byte budget."""
    kl, kr = jax.random.split(key)
    disp_l = _fused_refine_view(
        left_bgr, left_vol, seed_l, kl, cfg, h, w, tmax, adj_cap,
        fine_iterations, refine_start, max_neighbors,
    )
    disp_r = _fused_refine_view(
        right_bgr, right_vol, seed_r, kr, cfg, h, w, tmax, adj_cap,
        fine_iterations, refine_start, max_neighbors,
    )
    return disp_l, disp_r


def mst_stereo_temporal_fused(
    left_bgr,
    right_bgr,
    left_vol,
    right_vol,
    prev_left_disp,
    prev_right_disp,
    cfg: MSTConfig = MSTConfig(),
    seed: int = 0,
    fine_iterations: int = 4,
    refine_start: float | None = 2.0,
    max_neighbors: int = 2,
) -> MSTOutput:
    """One VIDEO frame as one jitted program: the previous frame's refined
    disparity maps (both views, dense) seed this frame's plane labels and
    a short truncated-ladder refinement absorbs the inter-frame motion —
    the measured degraded-seed repair behavior (PARITY.md) is exactly the
    mechanism. Requires forest_backend="device". The reference re-solves
    every frame from scratch at 100 random-init iterations
    (src/stereo_Yin.cpp:207, src/Stereo3DMST.cpp:858-889)."""
    from .mst import _apply_smoothness, _fused_capacities
    from ..ops.postprocess import lr_consistency

    h, w = int(np.asarray(left_bgr).shape[0]), int(np.asarray(left_bgr).shape[1])
    tmax, adj_cap = _fused_capacities(h, w, cfg)
    span = float(cfg.max_disp - 1)
    disp_l, disp_r = _mst_refine_frame_fused(
        jnp.asarray(np.asarray(left_bgr, np.float32)),
        jnp.asarray(np.asarray(right_bgr, np.float32)),
        jnp.asarray(left_vol),
        jnp.asarray(right_vol),
        jnp.clip(jnp.asarray(prev_left_disp), 0.0, span),
        jnp.clip(jnp.asarray(prev_right_disp), 0.0, span),
        jax.random.PRNGKey(seed), cfg, fine_iterations, refine_start,
        max_neighbors, h, w, tmax, adj_cap,
    )
    disp_l = _apply_smoothness(disp_l, left_bgr, cfg)
    disp_r = _apply_smoothness(disp_r, right_bgr, cfg)
    disp_l_checked, valid = lr_consistency(
        disp_l, disp_r, float(cfg.max_disp), fill=False
    )
    return MSTOutput(disp_l_checked, disp_r, valid)


def sgbm_mst_video(
    frames,
    volumes,
    cfg: MSTConfig = MSTConfig(),
    sgbm_cfg: SGBMConfig | None = None,
    reseed_every: int = 0,
    fine_iterations: int = 4,
    temporal_iterations: int | None = None,
    refine_start: float | None = 2.0,
    max_neighbors: int = 2,
    right_seed: str = "disp2",
    seed: int = 0,
) -> list[MSTOutput]:
    """Temporal-seeded streaming composition over a frame sequence.

    Frame 0 (and every `reseed_every`-th frame, if set) runs the full
    SGBM-seeded pipeline; every other frame seeds its plane labels from
    the PREVIOUS frame's refined maps (left: LR-valid pixels, holes
    filled with the reference's nearest-valid rule; right: the dense
    refined map) — so the steady-state frame skips SGBM entirely and
    runs only `temporal_iterations` (default: `fine_iterations`)
    truncated-ladder refinements. Absolute quality gated per frame on
    the procedural GT sequence (tests/test_mst_video.py).

    Measured recipe (GT sequence, 3 px/frame drift): pass a
    `refine_start` that COVERS the expected inter-frame motion (4.0 at
    3 px drift halved bad2 vs the single-frame default 2.0) and
    `temporal_iterations=2` — which measured BETTER than 4 (bad2
    2.3-3.3% vs 4.5-6.6%): with a one-frame-stale good seed, extra
    iterations pull labels toward the cost volume's own noisier optimum
    rather than toward GT.

    `frames` = iterable of (left_bgr, right_bgr); `volumes` = matching
    iterable of (left_vol, right_vol) cost volumes.
    """
    from .mst import mst_stereo_seeded

    span = float(cfg.max_disp - 1)
    ti = fine_iterations if temporal_iterations is None else temporal_iterations
    outs: list[MSTOutput] = []
    prev: MSTOutput | None = None
    for i, ((lb, rb), (lv, rv)) in enumerate(zip(frames, volumes)):
        keyframe = prev is None or (reseed_every and i % reseed_every == 0)
        if keyframe:
            out = sgbm_mst_stereo(
                lb, rb, lv, rv, cfg, sgbm_cfg, seed=seed + i,
                fine_iterations=fine_iterations, refine_start=refine_start,
                max_neighbors=max_neighbors, right_seed=right_seed,
            )
        else:
            seed_l = jnp.clip(
                nearest_valid_fill(prev.left_disp, prev.left_valid),
                0.0, span,
            )
            seed_r = jnp.clip(prev.right_disp, 0.0, span)
            out = mst_stereo_seeded(
                lb, rb, lv, rv, seed_l, seed_r, cfg, seed=seed + i,
                fine_iterations=ti, refine_start=refine_start,
                max_neighbors=max_neighbors,
            )
        outs.append(out)
        prev = out
    return outs
