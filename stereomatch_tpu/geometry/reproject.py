"""Disparity -> 3D reprojection with the Q matrix.

Equivalent of cv::reprojectImageTo3D (call sites src/stereo_opencv.cpp:177,
src/stereo_Yin.cpp:223): [X Y Z W]^T = Q @ [x y d 1]^T, output XYZ/W.
Q-matrix scaling for resized pairs mirrors
StereoMatching::scaleStereoPairQMatrix (src/StereoMatching.cpp:195-209).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["reproject_image_to_3d", "scale_q"]


def reproject_image_to_3d(
    disparity: jax.Array,
    Q: np.ndarray,
    handle_missing: bool = False,
    missing_z: float = 10000.0,
) -> jax.Array:
    """(H, W) disparity -> (H, W, 3) XYZ. With handle_missing=True, pixels
    with disparity <= 0 get Z = missing_z (OpenCV marks missing points with
    a large Z)."""
    H, W = disparity.shape
    Qj = jnp.asarray(Q, dtype=jnp.float32)
    y, x = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    d = disparity.astype(jnp.float32)
    X = Qj[0, 0] * x + Qj[0, 1] * y + Qj[0, 2] * d + Qj[0, 3]
    Y = Qj[1, 0] * x + Qj[1, 1] * y + Qj[1, 2] * d + Qj[1, 3]
    Z = Qj[2, 0] * x + Qj[2, 1] * y + Qj[2, 2] * d + Qj[2, 3]
    Wc = Qj[3, 0] * x + Qj[3, 1] * y + Qj[3, 2] * d + Qj[3, 3]
    w_inv = jnp.where(Wc != 0, 1.0 / Wc, 0.0)
    xyz = jnp.stack([X * w_inv, Y * w_inv, Z * w_inv], axis=-1)
    if handle_missing:
        bad = (d <= 0)[..., None]
        xyz = jnp.where(bad, jnp.array([0.0, 0.0, missing_z]), xyz)
    return xyz


def scale_q(Q: np.ndarray, scale: float) -> np.ndarray:
    """Scale Q for images resized by `scale` (rows 0..2, last column)."""
    q = np.asarray(Q, dtype=np.float64).copy()
    q[:3, 3] *= scale
    return q
