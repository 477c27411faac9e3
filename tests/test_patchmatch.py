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
)


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
