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


def test_valid_disparity_roi_matches_cv2():
    """cv::getValidDisparityROI oracle across rect/parameter combos —
    the rectangle that bm->setROI1/2 restricts StereoBM to
    (src/stereo_opencv (copy).cpp:258-268)."""
    import cv2

    from stereomatch_tpu.ops.bm import valid_disparity_roi

    cases = [
        ((0, 0, 640, 480), (0, 0, 640, 480), 0, 64, 9),
        ((10, 5, 600, 470), (3, 8, 620, 460), 0, 128, 21),
        ((16, 16, 500, 400), (40, 20, 550, 420), 16, 48, 5),
        ((0, 0, 100, 100), (90, 0, 100, 100), 0, 64, 9),  # near-empty
    ]
    for roi1, roi2, mind, nd, bs in cases:
        got = valid_disparity_roi(roi1, roi2, mind, nd, bs)
        exp = tuple(cv2.getValidDisparityROI(roi1, roi2, mind, nd, bs))
        if exp[2] <= 0 or exp[3] <= 0:
            assert got == (0, 0, 0, 0), (got, exp)
        else:
            assert got == exp, (roi1, roi2, mind, nd, bs)


def test_bm_respects_rectification_rois():
    """BMConfig.roi1/roi2 restrict validity to the getValidDisparityROI
    rectangle, like cv::StereoBM with setROI1/setROI2."""
    rng = np.random.default_rng(11)
    left, right, _ = _make_pair(rng)
    h, w = left.shape
    base = BMConfig(num_disp=32, block_size=9)
    roi = BMConfig(num_disp=32, block_size=9,
                   roi1=(0, 10, w, h - 30), roi2=(0, 10, w, h - 30))
    out0 = bm_disparity(jnp.asarray(left, jnp.float32),
                        jnp.asarray(right, jnp.float32), base)
    out1 = bm_disparity(jnp.asarray(left, jnp.float32),
                        jnp.asarray(right, jnp.float32), roi)
    v0, v1 = np.asarray(out0.valid), np.asarray(out1.valid)
    from stereomatch_tpu.ops.bm import valid_disparity_roi

    rx, ry, rw, rh = valid_disparity_roi(roi.roi1, roi.roi2, 0, 32, 9)
    assert ry > 0 and ry + rh < h
    # outside the rect: everything invalid
    assert not v1[:ry].any() and not v1[ry + rh:].any()
    # inside the rect: identical to the unrestricted run
    np.testing.assert_array_equal(v1[ry:ry + rh, rx:rx + rw],
                                  v0[ry:ry + rh, rx:rx + rw])
    np.testing.assert_array_equal(
        np.asarray(out1.disparity)[ry:ry + rh, rx:rx + rw],
        np.asarray(out0.disparity)[ry:ry + rh, rx:rx + rw])
