"""Bilinear remap as a JAX gather — the per-frame hot half of rectification.

Equivalent of cv::remap(..., INTER_LINEAR, BORDER_CONSTANT 0) as used at
src/stereo_opencv.cpp:128-129 and src/stereo_Yin.cpp:146-147, expressed as a
vectorized gather so XLA fuses the address math and the blend; taps outside
the source image contribute the border value (0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["remap_bilinear"]


@partial(jax.jit, static_argnames=("border_value",))
def remap_bilinear(src: jax.Array, mapx: jax.Array, mapy: jax.Array, border_value: float = 0.0) -> jax.Array:
    """Sample `src` (H, W) or (H, W, C) at float coords (mapx, mapy) with
    bilinear interpolation and constant border."""
    H, W = src.shape[0], src.shape[1]
    squeeze = src.ndim == 2
    img = src[..., None] if squeeze else src

    x0f = jnp.floor(mapx)
    y0f = jnp.floor(mapy)
    fx = (mapx - x0f).astype(img.dtype)
    fy = (mapy - y0f).astype(img.dtype)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[yc, xc]  # advanced indexing gather -> (H', W', C)
        return jnp.where(valid[..., None], vals, border_value)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    wx = fx[..., None]
    wy = fy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out[..., 0] if squeeze else out
