"""Weighted-Huber primal-dual denoise vs a direct NumPy re-derivation of the
reference update equations (.cu:1042-1126, host .cu:7809-7940)."""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.config import DenoiseConfig
from stereomatch_tpu.ops.variational import (
    edge_weight,
    huber_denoise,
    variational_disparity_denoise,
)


def _oracle(f, w, cfg, iters):
    h, wd = f.shape
    u, q = f.copy(), np.zeros_like(f)
    px, py = np.zeros_like(f), np.zeros_like(f)
    for _ in range(iters):
        dx = np.zeros_like(u)
        dy = np.zeros_like(u)
        dx[:, :-1] = u[:, 1:] - u[:, :-1]
        dy[:-1, :] = u[1:, :] - u[:-1, :]
        q = (q + cfg.sigma * (u - f)) / (1.0 + cfg.sigma * cfg.gamma)
        q = q / np.maximum(1.0, np.abs(q) / cfg.lam)
        px_n = (px + cfg.sigma * dx) / (1.0 + cfg.sigma * cfg.delta)
        py_n = (py + cfg.sigma * dy) / (1.0 + cfg.sigma * cfg.delta)
        norm = np.maximum(1.0, np.sqrt(px_n**2 + py_n**2) / w)
        px, py = px_n / norm, py_n / norm
        div = np.zeros_like(u)
        div[:, 0] += px[:, 0]
        div[:, 1:-1] += px[:, 1:-1] - px[:, :-2]
        div[:, -1] += -px[:, -2]
        div[0, :] += py[0, :]
        div[1:-1, :] += py[1:-1, :] - py[:-2, :]
        div[-1, :] += -py[-2, :]
        u = u + 2.0 * cfg.tau * (div - cfg.lam * q)
    return u


def test_huber_denoise_matches_numpy_oracle(rng):
    cfg = DenoiseConfig(iterations=7)
    f = rng.random((12, 16)).astype(np.float32)
    w = (0.2 + 0.8 * rng.random((12, 16))).astype(np.float32)
    got = np.asarray(huber_denoise(jnp.asarray(f), jnp.asarray(w), cfg))
    expect = _oracle(f, w, cfg, 7)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_edge_weight_range_and_flat(rng):
    gray = np.full((8, 8), 100.0, np.float32)
    w = np.asarray(edge_weight(jnp.asarray(gray)))
    np.testing.assert_allclose(w, 1.0)  # flat image -> weight 1 everywhere
    gray = (rng.random((8, 8)) * 255).astype(np.float32)
    w = np.asarray(edge_weight(jnp.asarray(gray)))
    assert (w > 0).all() and (w <= 1).all()


def test_denoise_reduces_noise(rng):
    """A piecewise-constant disparity + salt noise must move toward the
    clean field after 100 iterations (the reference's iteration count)."""
    h, w = 40, 48
    clean = np.zeros((h, w), np.float32)
    clean[:, 24:] = 30.0
    noisy = clean + (rng.random((h, w)) < 0.1) * 20.0
    gray = np.zeros((h, w), np.float32)
    gray[:, 24:] = 200.0
    out = np.asarray(
        variational_disparity_denoise(
            jnp.asarray(noisy), jnp.asarray(gray), 0, 60, DenoiseConfig()
        )
    )
    assert np.abs(out - clean).mean() < 0.5 * np.abs(noisy - clean).mean()
