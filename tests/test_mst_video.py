"""Temporal-seeded VIDEO mode (models/sgbm_mst.py::sgbm_mst_video).

The reference re-solves every frame of its FLIR capture from scratch —
100 random-init full-ladder iterations per view per frame
(src/stereo_Yin.cpp:207, src/Stereo3DMST.cpp:858-889). The video mode
seeds frame N+1's plane labels from frame N's refined maps, so the
steady-state frame skips SGBM and runs only a short truncated-ladder
refinement. Quality is gated ABSOLUTELY per frame on a procedural GT
sequence with exact subpixel truth and real (bounded) inter-frame motion
(synthetic.py::render_sequence).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stereomatch_tpu.eval import disparity_metrics
from stereomatch_tpu.synthetic import (
    render_scene,
    render_sequence,
    scene_eval_mask,
)


def test_render_sequence_frame0_matches_scene():
    """Frame 0 of a sequence is bitwise the single-frame scene (same RNG
    stream, identity shift) — the sequence gates inherit the battery's
    trust in render_scene's closed-form construction."""
    sc = render_scene(3, 96, 128, 32)
    f0 = render_sequence(3, 2, 96, 128, 32)[0]
    np.testing.assert_array_equal(f0.left, sc.left)
    np.testing.assert_array_equal(f0.right, sc.right)
    np.testing.assert_array_equal(f0.disp_left, sc.disp_left)
    np.testing.assert_array_equal(f0.occ_left, sc.occ_left)


def test_render_sequence_motion_is_real_and_bounded():
    """The discs actually move between frames (some pixels change
    disparity) while the background stays put (median frame-to-frame
    change is zero) and every frame's GT stays inside the scene bounds —
    the staleness a temporal seed must absorb is real but bounded."""
    seq = render_sequence(2, 3, 120, 160, 32, drift=3.0)
    for t in range(1, len(seq)):
        dd = np.abs(seq[t].disp_left - seq[t - 1].disp_left)
        assert np.median(dd) == 0.0  # static background
        changed = (dd > 0.1).mean()
        assert 0.005 < changed < 0.3, changed  # moving discs, not everything
        assert seq[t].disp_left.min() >= 2.0 - 1e-6
        assert seq[t].disp_left.max() <= 30.0 + 1e-6


@pytest.mark.parametrize("drift", [3.0])
def test_sgbm_mst_video_absolute_gt_sequence(drift):
    """3-frame video at the PRODUCTION video recipe (temporal_iterations=2,
    refine_start=4 >= the inter-frame motion): frame 0 is SGBM-keyframed,
    frames 1-2 seed from the previous refined maps. Every frame meets
    absolute gates on its own exact GT.

    Measured (240x320, D=32, seed 2, drift 3 px/frame, 4-frame probe):
    key epe 0.30 / bad2 1.7%; temporal ti=2 frames epe 0.37-0.62 / bad2
    2.3-3.3% — gates carry >2x headroom. The recipe facts the probe
    established: refine_start must cover the motion (rs=2 at 3 px drift
    doubled bad2), and ti=2 BEATS ti=4 on temporal frames (4.5-6.6%) —
    extra iterations pull labels away from the still-good seed toward the
    cost volume's own noisier optimum, the same effect PARITY.md measured
    on easy single frames."""
    from stereomatch_tpu.config import CostVolumeConfig, MSTConfig
    from stereomatch_tpu.models.sgbm_mst import sgbm_mst_video
    from stereomatch_tpu.ops.cost import adgrad_bgr_volumes

    H, W, D = 240, 320, 32
    seq = render_sequence(2, 3, H, W, D, drift=drift)
    vols = []
    for sc in seq:
        lv, rv = adgrad_bgr_volumes(
            sc.left, sc.right, CostVolumeConfig(min_disp=0, max_disp=D - 1)
        )
        lv, rv = np.asarray(lv), np.asarray(rv)
        s = 0.5 / max(lv.max(), rv.max())
        vols.append((lv * s, rv * s))
    cfg = MSTConfig(max_disp=D, iterations=30, min_cc_size=100, c=2000.0)
    outs = sgbm_mst_video(
        [(sc.left, sc.right) for sc in seq], vols, cfg,
        fine_iterations=4, temporal_iterations=2, refine_start=4.0,
    )
    for i, (sc, out) in enumerate(zip(seq, outs)):
        m = scene_eval_mask(sc)
        valid = np.asarray(out.left_valid) & m
        assert valid.mean() > 0.35, (i, valid.mean())
        mm = disparity_metrics(np.asarray(out.left_disp), sc.disp_left, valid)
        if i == 0:  # SGBM keyframe: the established seeded gate
            assert mm["epe"] < 1.2, (i, mm)
            assert mm["bad2"] < 0.08, (i, mm)
        else:  # temporal frames absorb one frame of motion staleness
            assert mm["epe"] < 1.5, (i, mm)
            assert mm["bad2"] < 0.08, (i, mm)


def test_mst_temporal_fused_matches_seeded_unfused():
    """mst_stereo_temporal_fused (refine-only frame as ONE jitted program,
    device forest) follows the same stages + RNG stream as
    mst_stereo_seeded with forest_backend="device" given the same seed
    maps — agreement up to fp-tie label flips."""
    from stereomatch_tpu.config import MSTConfig
    from stereomatch_tpu.models.mst import mst_stereo_seeded
    from stereomatch_tpu.models.sgbm_mst import mst_stereo_temporal_fused

    rng = np.random.default_rng(11)
    h, w, d = 48, 64, 16
    bgr_l = rng.random((h, w, 3)).astype(np.float32) * 255
    for _ in range(2):
        bgr_l = (bgr_l + np.roll(bgr_l, 1, 0) + np.roll(bgr_l, 1, 1)) / 3
    bgr_r = np.roll(bgr_l, -3, axis=1)
    vol_l = (rng.random((h, w, d)) * 0.5).astype(np.float32)
    vol_r = (rng.random((h, w, d)) * 0.5).astype(np.float32)
    # a plausible "previous frame" disparity pair: smooth planes
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    prev_l = np.clip(0.1 * xs + 3.0, 0, d - 1)
    prev_r = np.clip(0.1 * xs + 2.5, 0, d - 1)
    cfg = MSTConfig(
        max_disp=d, iterations=8, min_cc_size=20, c=800.0,
        forest_backend="device",
    )
    out_u = mst_stereo_seeded(
        bgr_l, bgr_r, vol_l, vol_r, prev_l, prev_r, cfg, seed=0,
        fine_iterations=3, max_neighbors=4,
    )
    out_f = mst_stereo_temporal_fused(
        bgr_l, bgr_r, vol_l, vol_r, prev_l, prev_r, cfg, seed=0,
        fine_iterations=3, max_neighbors=4,
    )
    du, df = np.asarray(out_u.right_disp), np.asarray(out_f.right_disp)
    assert (np.abs(du - df) < 0.1).mean() > 0.95
    cu, cf = np.asarray(out_u.left_disp), np.asarray(out_f.left_disp)
    assert (np.abs(cu - cf) < 0.1).mean() > 0.95
