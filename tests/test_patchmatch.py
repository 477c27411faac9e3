"""PatchMatch backend: plane-cost sanity and convergence on synthetic
slanted-plane scenes (ref: src/PatchMatchStereoGPU.cu:861-998, :1740-2010)."""

import numpy as np
import jax
import jax.numpy as jnp

from stereomatch_tpu.config import PatchMatchConfig
from stereomatch_tpu.ops.patchmatch import (
    PlaneState,
    patchmatch_stereo,
    plane_cost,
    plane_fill_occluded,
)


def test_plane_fill_occluded():
    """Invalid pixels take the nearest valid plane extended to them, lower
    disparity winning (pm.cpp:367-392)."""
    h, w = 2, 6
    # planes: constant-d 10 on the left end, slanted a=1 on the right end
    nx = np.zeros((h, w), np.float32)
    ny = np.zeros((h, w), np.float32)
    d = np.zeros((h, w), np.float32)
    d[:, 0] = 10.0
    # right plane at x=5: slope a=0.5 => nx/nz = -0.5
    a = 0.5
    nz = 1.0 / np.sqrt(1 + a * a)
    nx[:, 5] = -a * nz
    d[:, 5] = 4.0
    valid = np.zeros((h, w), bool)
    valid[:, 0] = True
    valid[:, 5] = True
    out = np.asarray(
        plane_fill_occluded(
            PlaneState(jnp.asarray(nx), jnp.asarray(ny), jnp.asarray(d)),
            jnp.asarray(valid),
        )
    )
    # left plane extends flat 10; right plane at x: 4 + 0.5*(x-5)
    for x in range(1, 5):
        expect = min(10.0, 4.0 + a * (x - 5))
        np.testing.assert_allclose(out[0, x], expect, rtol=1e-5)
    np.testing.assert_allclose(out[:, 0], 10.0)
    np.testing.assert_allclose(out[:, 5], 4.0, atol=1e-5)


def _shifted_pair(rng, h=48, w=72, true_d=5):
    base = rng.random((h, w + true_d, 3)).astype(np.float32) * 255
    base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 0)) / 3
    left = base[:, :w]
    right = base[:, true_d:]
    return left, right


def test_plane_cost_prefers_truth(rng):
    true_d = 5
    left, right = _shifted_pair(rng, true_d=true_d)
    h, w = left.shape[:2]
    cfg = PatchMatchConfig(min_disp=0, max_disp=12, window_size=15, tap_stride=3)
    gray = lambda im: 0.114 * im[..., 0] + 0.587 * im[..., 1] + 0.299 * im[..., 2]

    def cost_at(d):
        planes = PlaneState(
            jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.full((h, w), float(d))
        )
        return np.asarray(
            plane_cost(
                jnp.asarray(left), gray(jnp.asarray(left)), gray(jnp.asarray(right)),
                planes, cfg, -1,
            )
        )

    c_true = cost_at(true_d)
    c_wrong = cost_at(true_d + 4)
    inner = np.s_[8:-8, 12:-12]
    assert c_true[inner].mean() < c_wrong[inner].mean()
    # true-disparity cost should be ~0 (identical windows)
    assert c_true[inner].mean() < 0.02, c_true[inner].mean()


def test_patchmatch_adgrad_converges(rng):
    """CPU-pm dissimilarity metric (pm.cpp:97-160) also recovers the shift."""
    true_d = 5
    left, right = _shifted_pair(rng, true_d=true_d)
    cfg = PatchMatchConfig(
        min_disp=0, max_disp=12, window_size=15, tap_stride=3, iterations=16,
        metric="adgrad",
    )
    l, r, cl, cr = patchmatch_stereo(
        jax.random.PRNGKey(1), jnp.asarray(left), jnp.asarray(right), cfg
    )
    dl = np.asarray(l.d)
    inner = dl[10:-10, 14:-14]
    frac_good = (np.abs(inner - true_d) < 1.0).mean()
    assert frac_good > 0.8, frac_good


def test_patchmatch_converges_to_shift(rng):
    true_d = 5
    left, right = _shifted_pair(rng, true_d=true_d)
    cfg = PatchMatchConfig(
        min_disp=0, max_disp=12, window_size=15, tap_stride=3, iterations=6
    )
    l, r, cl, cr = patchmatch_stereo(
        jax.random.PRNGKey(0), jnp.asarray(left), jnp.asarray(right), cfg
    )
    dl = np.asarray(l.d)
    inner = dl[10:-10, 14:-14]
    frac_good = (np.abs(inner - true_d) < 1.0).mean()
    assert frac_good > 0.8, frac_good


def test_plane_fill_best_cost_prefers_low_cost_donor(rng):
    """GPU fillInOccluded semantics (.cu:2190-2224): the occluded pixel takes
    the donor whose plane EVALUATES best at it — not the lower disparity.
    A wrong low-disparity donor on one side must lose to the correct one."""
    from stereomatch_tpu.ops.patchmatch import plane_fill_occluded_best_cost

    true_d = 5
    left, right = _shifted_pair(rng, h=40, w=80, true_d=true_d)
    h, w = left.shape[:2]
    gray = lambda im: 0.114 * im[..., 0] + 0.587 * im[..., 1] + 0.299 * im[..., 2]
    cfg = PatchMatchConfig(min_disp=0, max_disp=12, window_size=15, tap_stride=3)

    d = np.full((h, w), float(true_d), np.float32)
    d[:, 55:] = 2.0  # wrong, LOWER-disparity donors on the right
    planes = PlaneState(
        jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.asarray(d)
    )
    valid = np.zeros((h, w), bool)
    valid[:, :25] = True
    valid[:, 55:] = True

    out = np.asarray(
        plane_fill_occluded_best_cost(
            planes, jnp.asarray(valid),
            jnp.asarray(left), gray(jnp.asarray(left)), gray(jnp.asarray(right)),
            cfg, -1,
        )
    )
    # valid pixels untouched
    np.testing.assert_allclose(out[:, :25], true_d)
    np.testing.assert_allclose(out[:, 55:], 2.0)
    # columns where BOTH donor sides are within the +-W/4=20 reach: the
    # CORRECT donor must win on cost despite its higher disparity
    # (plane_fill_occluded's min-disparity rule would pick 2.0 instead)
    inner = out[8:-8, 36:44]
    frac = (np.abs(inner - true_d) < 0.5).mean()
    assert frac > 0.9, frac
