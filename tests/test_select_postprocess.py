"""WTA selection and post-processing vs NumPy oracles re-deriving the
reference semantics (selectDisparity .cu:1688-1737; leftRightConsistencyCheck
Stereo3DMST.cpp:632-710; weightedMedianFilter .cu:2436-2600)."""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.config import WeightedMedianConfig
from stereomatch_tpu.ops import (
    lr_consistency,
    lr_occlusion_mask,
    nearest_valid_fill,
    weighted_median,
    wta_disparity,
)


def _wta_oracle(vol, min_disp=0):
    h, w, nd = vol.shape
    out = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            best = int(np.argmin(vol[y, x]))
            cur = vol[y, x, best]
            pre = 0.0 if best == 0 else vol[y, x, best - 1]
            nxt = 0.0 if best == nd - 1 else vol[y, x, best + 1]
            denom = nxt - 2.0 * cur + pre
            upd = (nxt - pre) * 0.5 / denom if denom != 0 else np.inf
            d = best + min_disp
            out[y, x] = d - upd if abs(upd) < 1.0 else d
    return out


def test_wta_subpixel_oracle(rng):
    vol = rng.random((7, 9, 12)).astype(np.float32)
    # plant some exact parabolas and some boundary minima
    vol[0, 0, :] = np.abs(np.arange(12) - 4.3) ** 2  # min at 4, subpixel +0.3
    vol[1, 1, :] = np.arange(12)  # min at boundary d=0
    vol[2, 2, :] = np.arange(12)[::-1]  # min at boundary d=11
    got = np.asarray(wta_disparity(jnp.asarray(vol), min_disp=3))
    np.testing.assert_allclose(got, _wta_oracle(vol, 3), rtol=1e-5, atol=1e-5)
    assert abs(got[0, 0] - (4.3 + 3)) < 1e-3


def test_wta_coupled_oracle(rng):
    """AL-coupled WTA (ref: MCCNN_ALTV_CostVolumeWTA, .cu:4748-4803)."""
    from stereomatch_tpu.ops.select import wta_coupled

    vol = rng.random((5, 6, 10)).astype(np.float32)
    u = (rng.random((5, 6)) * 9).astype(np.float32)
    lagr = (rng.random((5, 6)) - 0.5).astype(np.float32)
    lam, th = 0.7, 4.0
    ds = np.arange(10, dtype=np.float32)
    diff = u[..., None] - ds
    coupled = lam * vol + lagr[..., None] * diff + 0.5 * th * diff * diff
    got = np.asarray(
        wta_coupled(jnp.asarray(vol), jnp.asarray(u), jnp.asarray(lagr), lam, th)
    )
    np.testing.assert_allclose(got, _wta_oracle(coupled, 0), rtol=1e-5, atol=1e-5)


def test_wta_tie_breaks_first():
    vol = np.ones((1, 1, 8), np.float32)
    vol[0, 0, 3] = 0.0
    vol[0, 0, 6] = 0.0
    got = np.asarray(wta_disparity(jnp.asarray(vol), subpixel=False))
    assert got[0, 0] == 3


def _lr_oracle(left, right, max_disp, fill):
    """Direct re-derivation of Stereo3DMST.cpp:632-710 (originally-valid
    interpretation of the racy fill)."""
    h, w = left.shape
    out = left.copy()
    mask = np.zeros((h, w), bool)  # True = invalid
    for y in range(h):
        for x in range(w):
            d = int(round(float(left[y, x])))
            if x - d >= 0 and 0 <= d < max_disp:
                if abs(left[y, x] - right[y, x - d]) > 1.0:
                    mask[y, x] = True
                    out[y, x] = 0.0
            else:
                mask[y, x] = True
                out[y, x] = 0.0
    if not fill:
        return out, ~mask
    src = out.copy()
    filled = out.copy()
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            fl = fr = None
            for i in range(1, w):
                if x - i >= 0 and fl is None and not mask[y, x - i]:
                    fl = src[y, x - i]
                if x + i < w and fr is None and not mask[y, x + i]:
                    fr = src[y, x + i]
            if fl is not None and fr is not None:
                filled[y, x] = min(fl, fr)
            elif fl is not None:
                filled[y, x] = fl
            elif fr is not None:
                filled[y, x] = fr
    return filled, ~mask


def test_lr_consistency_oracle(rng):
    h, w, max_disp = 6, 30, 10
    left = (rng.random((h, w)) * 12 - 1).astype(np.float32)
    right = (rng.random((h, w)) * 12 - 1).astype(np.float32)
    for fill in (False, True):
        got, valid = lr_consistency(
            jnp.asarray(left), jnp.asarray(right), max_disp, fill=fill
        )
        expect, evalid = _lr_oracle(left, right, max_disp, fill)
        np.testing.assert_array_equal(np.asarray(valid), evalid)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_nearest_valid_fill_rows_independent(rng):
    disp = np.array([[0.0, 5.0, 0.0, 0.0, 2.0, 0.0]], np.float32)
    valid = disp > 0
    got = np.asarray(nearest_valid_fill(jnp.asarray(disp), jnp.asarray(valid)))
    # x=0: only right neighbor (5) -> 5; x=2,3: min(5,2)=2; x=5: only left (2)
    np.testing.assert_allclose(got[0], [5.0, 5.0, 2.0, 2.0, 2.0, 2.0])


def test_lr_occlusion_mask_signs():
    left = np.zeros((1, 8), np.float32)
    right = np.zeros((1, 8), np.float32)
    left[0, 5] = 2.0
    right[0, 3] = 2.0
    m = np.asarray(
        lr_occlusion_mask(jnp.asarray(left), jnp.asarray(right), -1, max_disp=7.0)
    )
    assert not m[0, 5]  # consistent: left(5)=2 matches right(3)=2
    # zeros are "invalid" (d <= 0) everywhere else
    assert m[0, 0] and m[0, 4]


def _wmedian_oracle(disp, bgr, occ, win_r, gamma):
    h, w = disp.shape
    out = disp.copy()
    for y in range(h):
        for x in range(w):
            if not occ[y, x]:
                continue
            ds, ws = [], []
            for dy in range(-win_r, win_r + 1):
                for dx in range(-win_r, win_r + 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        cd = np.sqrt(np.sum(np.abs(bgr[yy, xx] - bgr[y, x])))
                        ds.append(disp[yy, xx])
                        ws.append(np.exp(-cd * gamma))
            order = np.argsort(ds, kind="stable")
            ds, ws = np.asarray(ds)[order], np.asarray(ws)[order]
            csum = np.cumsum(ws) / ws.sum()
            out[y, x] = ds[np.searchsorted(csum, 0.5)]
    return out


def test_weighted_median_oracle(rng):
    h, w = 10, 12
    disp = (rng.random((h, w)) * 20).astype(np.float32)
    bgr = rng.random((h, w, 3)).astype(np.float32)
    occ = rng.random((h, w)) < 0.4
    cfg = WeightedMedianConfig(window_size=5, tap_stride=1, bisect_iters=40)
    got = np.asarray(
        weighted_median(
            jnp.asarray(disp), jnp.asarray(bgr), jnp.asarray(occ), cfg
        )
    )
    expect = _wmedian_oracle(disp, bgr, occ, 2, 25.5)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)
