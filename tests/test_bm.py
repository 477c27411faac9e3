"""StereoBM backend vs cv2.StereoBM (the reference's legacy CLI engine,
src/stereo_opencv (copy).cpp:258-268 — OpenCV is the golden oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from stereomatch_tpu.config import BMConfig
from stereomatch_tpu.ops.bm import bm_disparity


def _make_pair(rng, h=96, w=192, smooth=1):
    tex = rng.random((h, w + 40)).astype(np.float32)
    for _ in range(smooth):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 0) + np.roll(tex, -1, 1)) / 4
    tex = (tex * 255).astype(np.uint8)
    disp_true = np.full((h, w), 8.0, np.float32)
    disp_true[h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = 20.0
    right = tex[:, 40 : 40 + w]
    left = np.zeros_like(right)
    xs = np.arange(w)
    for y in range(h):
        left[y] = tex[y, 40 + xs - disp_true[y].astype(int)]
    return left, right, disp_true


def _cv_bm(cfg: BMConfig):
    bm = cv2.StereoBM_create(numDisparities=cfg.num_disp, blockSize=cfg.block_size)
    bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_XSOBEL)
    bm.setPreFilterCap(cfg.prefilter_cap)
    bm.setMinDisparity(cfg.min_disp)
    bm.setTextureThreshold(cfg.texture_threshold)
    bm.setUniquenessRatio(cfg.uniqueness_ratio)
    bm.setSpeckleWindowSize(0)  # speckle pass tested separately (ops/speckle)
    bm.setDisp12MaxDiff(cfg.disp12_max_diff)
    return bm


def test_bm_vs_opencv_d1():
    rng = np.random.default_rng(5)
    left, right, _ = _make_pair(rng)
    cfg = BMConfig(num_disp=32, block_size=9)
    ref = _cv_bm(cfg).compute(left, right).astype(np.float32) / 16.0
    out = bm_disparity(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), cfg)
    mine, mv = np.asarray(out.disparity), np.asarray(out.valid)
    rv = ref >= cfg.min_disp
    both = rv & mv
    assert both.mean() > 0.5, both.mean()
    err = np.abs(mine[both] - ref[both])
    d1 = (err > 1.0).mean()
    assert d1 < 0.01, f"D1 vs cv2.StereoBM = {d1:.4f}"
    agree = (rv == mv).mean()
    assert agree > 0.9, f"valid-mask agreement {agree:.3f}"


def test_bm_recovers_truth():
    rng = np.random.default_rng(9)
    left, right, disp_true = _make_pair(rng)
    cfg = BMConfig(num_disp=32, block_size=9)
    out = bm_disparity(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), cfg)
    mine, valid = np.asarray(out.disparity), np.asarray(out.valid)
    err = np.abs(mine - disp_true)[valid]
    assert (err < 1.0).mean() > 0.9, (err < 1.0).mean()


def test_bm_texture_threshold_invalidates_flat():
    """A textureless band must be invalidated by textureThreshold."""
    rng = np.random.default_rng(2)
    left, right, _ = _make_pair(rng)
    left, right = left.copy(), right.copy()
    left[40:56] = 128
    right[40:56] = 128
    cfg = BMConfig(num_disp=32, block_size=9, texture_threshold=400)
    out = bm_disparity(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32), cfg)
    valid = np.asarray(out.valid)
    # rows fully inside the flat band (minus block radius) are invalid
    assert valid[46:50, 48:-8].mean() < 0.05
    # textured rows stay mostly valid
    assert valid[8:32, 48:-8].mean() > 0.7


def test_bm_pipeline_speckle_runs():
    from stereomatch_tpu.pipelines import bm_pipeline

    rng = np.random.default_rng(4)
    left, right, disp_true = _make_pair(rng)
    disp = bm_pipeline(left, right, BMConfig(num_disp=32, block_size=9))
    valid = disp >= 0
    err = np.abs(disp - disp_true)[valid]
    assert (err < 1.0).mean() > 0.9
