"""Cost-construction ops vs brute-force NumPy oracles.

Oracles re-derive the reference semantics (cited in each op's docstring)
independently; interior pixels must match exactly (modulo float assoc)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereomatch_tpu.config import CensusConfig, CostVolumeConfig, ZNCCConfig
from stereomatch_tpu.ops import (
    adgrad_bgr_volumes,
    census_cost_volumes,
    census_stereo,
    local_contrast,
    shifted_stack,
    windowed_volumes,
)


def test_shifted_stack_matches_indexing(rng):
    img = rng.random((6, 20)).astype(np.float32)
    stack, valid = shifted_stack(jnp.asarray(img), 5, -1, min_disp=0)
    stack = np.asarray(stack)
    for d in range(5):
        for x in range(20):
            if x - d >= 0:
                assert valid[x, d]
                np.testing.assert_array_equal(stack[:, x, d], img[:, x - d])
            else:
                assert not valid[x, d]


def _census_code(img, y, x, eps, win_rw, win_rh):
    """Ternary codes of the window centered at (y, x); edge padding."""
    h, w = img.shape
    codes = []
    for dy in range(-win_rh, win_rh + 1):
        for dx in range(-win_rw, win_rw + 1):
            if dy == 0 and dx == 0:
                continue
            yy = min(max(y + dy, 0), h - 1)
            xx = min(max(x + dx, 0), w - 1)
            diff = img[yy, xx] - img[y, x]
            codes.append(2 if diff > eps else (0 if diff < -eps else 1))
    return np.array(codes)


def test_census_cost_volume_oracle(rng):
    cfg = CensusConfig(win_rw=2, win_rh=3, d_max=6)
    h, w = 14, 24
    left = rng.random((h, w)).astype(np.float32)
    right = rng.random((h, w)).astype(np.float32)
    lvol, rvol = census_cost_volumes(jnp.asarray(left), jnp.asarray(right), cfg)
    lvol, rvol = np.asarray(lvol), np.asarray(rvol)
    n_taps = (2 * cfg.win_rw + 1) * (2 * cfg.win_rh + 1) - 1

    for y in range(cfg.win_rh, h - cfg.win_rh):
        for x in range(cfg.win_rw, w - cfg.win_rw):
            cr = _census_code(right, y, x, cfg.epsilon, cfg.win_rw, cfg.win_rh)
            cl = _census_code(left, y, x, cfg.epsilon, cfg.win_rw, cfg.win_rh)
            for d in range(cfg.d_max + 1):
                # right reference: match left at x+d
                if x + d < w:
                    cm = _census_code(left, y, x + d, cfg.epsilon, cfg.win_rw, cfg.win_rh)
                    assert rvol[y, x, d] == int(np.sum(cr != cm)), (y, x, d)
                else:
                    assert rvol[y, x, d] == n_taps
                # left reference: match right at x-d
                if x - d >= 0:
                    cm = _census_code(right, y, x - d, cfg.epsilon, cfg.win_rw, cfg.win_rh)
                    assert lvol[y, x, d] == int(np.sum(cl != cm))
                else:
                    assert lvol[y, x, d] == n_taps


def test_census_stereo_recovers_shift(rng):
    """A purely translated pair must WTA to the true disparity in the interior."""
    cfg = CensusConfig(win_rw=3, win_rh=4, d_max=8)
    h, w, true_d = 30, 60, 5
    base = rng.random((h, w + true_d)).astype(np.float32)
    left = base[:, :w]               # left(x) = base(x)
    right = base[:, true_d:]         # right(x) = base(x + d) = left(x + d)
    disp = np.asarray(census_stereo(jnp.asarray(left), jnp.asarray(right), cfg))
    inner = disp[cfg.win_rh + 2 : -cfg.win_rh - 2, cfg.win_rw + 2 : w - cfg.win_rw - cfg.d_max - 2]
    assert (inner == true_d).mean() > 0.95


def test_adgrad_bgr_oracle(rng):
    cfg = CostVolumeConfig(min_disp=0, max_disp=5)
    h, w = 8, 20
    left = (rng.random((h, w, 3)) * 255).astype(np.float32)
    right = (rng.random((h, w, 3)) * 255).astype(np.float32)
    lvol, rvol = adgrad_bgr_volumes(jnp.asarray(left), jnp.asarray(right), cfg)
    lvol, rvol = np.asarray(lvol), np.asarray(rvol)

    def gray(img, y, x):
        return 0.114 * img[y, x, 0] + 0.587 * img[y, x, 1] + 0.299 * img[y, x, 2]

    for y in range(h):
        for x in range(w):
            for d in range(cfg.num_disp):
                if x + d + 1 < w:
                    c = np.sum(np.abs(right[y, x] - left[y, x + d]))
                    g_ref = gray(right, y, x + 1) - gray(right, y, x)
                    g_mat = gray(left, y, x + d + 1) - gray(left, y, x + d)
                    expect = 0.11 * min(c / 3.0, 7.0) + 0.89 * min(abs(g_ref - g_mat), 2.0)
                    np.testing.assert_allclose(rvol[y, x, d], expect, rtol=2e-5)
                else:
                    assert rvol[y, x, d] == cfg.bad_cost
                # left volume = same cost at left pixel x' = x (match right x-d)
                if x - d >= 0 and x + 1 < w:
                    np.testing.assert_allclose(
                        lvol[y, x, d], rvol[y, x - d, d], rtol=1e-6
                    )
                elif x - d < 0 or x + 1 >= w:
                    assert lvol[y, x, d] == cfg.bad_cost


@pytest.mark.parametrize("metric", ["zncc", "ad", "agd"])
def test_windowed_volume_oracle(rng, metric):
    cfg = ZNCCConfig(min_disp=0, max_disp=4, win_radius=2, metric=metric)
    h, w = 12, 18
    left = rng.random((h, w)).astype(np.float32) + 0.1
    right = rng.random((h, w)).astype(np.float32) + 0.1
    _, rvol = windowed_volumes(jnp.asarray(left), jnp.asarray(right), cfg)
    rvol = np.asarray(rvol)
    r = cfg.win_radius
    n = (2 * r + 1) ** 2

    def gx(img):
        g = np.diff(img, axis=1)
        return np.concatenate([g, np.zeros((h, 1), np.float32)], axis=1)

    gl, gr = gx(left), gx(right)
    for y in range(r, h - r):
        for x in range(r, w - r):
            for d in range(5):
                if x + d + r + 1 >= w:
                    continue
                ref = right[y - r : y + r + 1, x - r : x + r + 1]
                mat = left[y - r : y + r + 1, x + d - r : x + d + r + 1]
                if metric == "zncc":
                    expect = -np.sum(ref * mat) / (
                        n * np.sqrt((ref**2).mean()) * np.sqrt((mat**2).mean())
                    )
                elif metric == "ad":
                    expect = np.sum(np.minimum(np.abs(ref - mat), 7.0))
                else:
                    gref = gr[y - r : y + r + 1, x - r : x + r + 1]
                    gmat = gl[y - r : y + r + 1, x + d - r : x + d + r + 1]
                    expect = np.sum(
                        0.1 * np.minimum(np.abs(ref - mat), 7.0)
                        + 0.9 * np.minimum(np.abs(gref - gmat), 2.0)
                    )
                np.testing.assert_allclose(rvol[y, x, d], expect, rtol=2e-4, atol=1e-5)


def test_local_contrast_zero_mean(rng):
    img = rng.random((32, 32)).astype(np.float32)
    out = np.asarray(local_contrast(jnp.asarray(img), 4))
    # interior: exact windowed-mean subtraction
    y, x, r = 16, 16, 4
    expect = img[y, x] - img[y - r : y + r + 1, x - r : x + r + 1].mean()
    np.testing.assert_allclose(out[y, x], expect, rtol=1e-5, atol=1e-6)
