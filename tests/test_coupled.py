"""Coupled PatchMatch <-> variational engines (models/coupled.py): the
alternating schemes must beat their uncoupled counterparts (plain WTA +
Huber denoise) on a noisy synthetic volume — the re-selection from the data
each round is what filtering a fixed WTA map cannot do."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereomatch_tpu.config import CoupledConfig, DenoiseConfig


def _noisy_slanted_volume(rng, h=48, w=64, nd=24, noise=0.6):
    """Clean minimum follows d = 0.15x + 4; heavy per-entry noise makes
    plain WTA pick wrong disparities on a large fraction of pixels."""
    xs = np.arange(w, dtype=np.float32)[None, :]
    d_true = 0.15 * xs + 4.0 + np.zeros((h, 1), np.float32)
    ds = np.arange(nd, dtype=np.float32)[None, None, :]
    clean = np.minimum(np.abs(ds - d_true[..., None]) * 0.12, 0.5)
    vol = clean + rng.random((h, w, nd)).astype(np.float32) * noise
    return vol.astype(np.float32), d_true


def _plain_wta_denoise(vol, gray, iters):
    from stereomatch_tpu.ops.select import wta_disparity
    from stereomatch_tpu.ops.variational import variational_disparity_denoise

    d = wta_disparity(jnp.asarray(vol), 0)
    return np.asarray(
        variational_disparity_denoise(
            d, jnp.asarray(gray), 0, vol.shape[2] - 1,
            DenoiseConfig(iterations=iters),
        )
    )


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    vol, d_true = _noisy_slanted_volume(rng)
    gray = np.full(vol.shape[:2], 128.0, np.float32)
    return vol, gray, d_true


def test_coupled_wta_improves_wta(problem):
    """The AL-coupled WTA <-> TGV alternation must reduce raw-WTA error by
    a wide margin (re-selection within the smoothed trust region). On iid
    per-entry volume noise, POINTWISE re-selection cannot beat plain
    WTA+denoise (the data readout itself has SNR < 1) — that win belongs
    to the window-aggregating coupled PatchMatch below."""
    from stereomatch_tpu.ops.select import wta_disparity
    from stereomatch_tpu.ops.tgv import TGVParams
    from stereomatch_tpu.models.coupled import coupled_wta_stereo

    vol, gray, d_true = problem
    cfg = CoupledConfig(
        max_disp=vol.shape[2] - 1, outer_iterations=40, smooth_iters=10,
        lambda_d=1.0, theta_inv0=1.0, beta_anneal=0.01,
    )
    out = coupled_wta_stereo(
        jnp.asarray(vol), jnp.asarray(gray), cfg, TGVParams(lambda_s=2.0)
    )
    inner = np.s_[4:-4, 4:-4]
    mae_wta = np.abs(
        np.asarray(wta_disparity(jnp.asarray(vol), 0)) - d_true
    )[inner].mean()
    mae_coupled = np.abs(np.asarray(out.disparity) - d_true)[inner].mean()
    assert mae_coupled < 0.6 * mae_wta, (mae_coupled, mae_wta)
    # u and a converge together under the theta ramp
    gap = np.abs(np.asarray(out.disparity) - np.asarray(out.smoothed)).mean()
    assert gap < 0.5, gap


def test_coupled_patchmatch_beats_plain(problem):
    """The stereoMatching_huber alternation (window-aggregated hybrid cost
    + Huber-ROF field smoothing) must beat plain WTA+denoise: its smoothed
    field is the engine's output (the reference outputs the variational
    field, .cu:7320)."""
    from stereomatch_tpu.models.coupled import coupled_patchmatch_stereo

    vol, gray, d_true = problem
    bgr = np.broadcast_to(gray[..., None], gray.shape + (3,)).astype(np.float32)
    cfg = CoupledConfig(
        max_disp=vol.shape[2] - 1, window_size=15, tap_stride=3,
        outer_iterations=8, smooth_iters=10,
    )
    out = coupled_patchmatch_stereo(
        jax.random.PRNGKey(1), jnp.asarray(bgr), jnp.asarray(vol), cfg
    )
    plain = _plain_wta_denoise(vol, gray, 150)

    inner = np.s_[4:-4, 4:-4]
    mae_coupled = np.abs(np.asarray(out.smoothed) - d_true)[inner].mean()
    mae_plain = np.abs(plain - d_true)[inner].mean()
    assert mae_coupled < mae_plain, (mae_coupled, mae_plain)
    assert mae_coupled < 0.5, mae_coupled


def test_hybrid_plane_cost_prefers_truth(problem):
    """The evaluateCost_huber window cost must rank the true plane below a
    wrong one on the clean volume."""
    from stereomatch_tpu.ops.coupled import hybrid_plane_cost
    from stereomatch_tpu.ops.patchmatch import PlaneState

    vol, gray, d_true = problem
    h, w, nd = vol.shape
    # use the CLEAN volume for an unambiguous ranking check
    xs = np.arange(w, dtype=np.float32)[None, :]
    ds = np.arange(nd, dtype=np.float32)[None, None, :]
    clean = np.minimum(np.abs(ds - d_true[..., None]) * 0.12, 0.5).astype(np.float32)
    bgr = np.broadcast_to(gray[..., None], (h, w, 3)).astype(np.float32)
    cfg = CoupledConfig(max_disp=nd - 1, window_size=15, tap_stride=3)

    # true slanted plane: d = 0.15x + 4 -> nx/nz = -0.15
    a = 0.15
    nz = 1.0 / np.sqrt(1 + a * a)
    nx = np.full((h, w), -a * nz, np.float32)
    d_map = (0.15 * xs + 4.0 + np.zeros((h, 1))).astype(np.float32)
    true_planes = PlaneState(jnp.asarray(nx), jnp.zeros((h, w)), jnp.asarray(d_map))
    wrong_planes = PlaneState(
        jnp.zeros((h, w)), jnp.zeros((h, w)), jnp.asarray(d_map + 5.0)
    )
    c_true = np.asarray(
        hybrid_plane_cost(jnp.asarray(bgr), jnp.asarray(clean), true_planes, cfg, -1)
    )
    c_wrong = np.asarray(
        hybrid_plane_cost(jnp.asarray(bgr), jnp.asarray(clean), wrong_planes, cfg, -1)
    )
    inner = np.s_[8:-8, 8:-8]
    assert c_true[inner].mean() < c_wrong[inner].mean()
    assert c_true[inner].mean() < 0.05, c_true[inner].mean()
