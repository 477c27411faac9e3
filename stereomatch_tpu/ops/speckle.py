"""Speckle filtering: parallel connected components on the disparity image.

Equivalent of cv2.filterSpeckles as used by the reference's SGBM config
(speckleWindowSize=100, speckleRange=32, src/StereoMatching.cpp:156-173;
StereoSGBM::compute passes maxDiff = DISP_SCALE*speckleRange on its 1/16
fixed-point map, i.e. 32 WHOLE disparities on a float map — not 32/16):
4-connected regions of pixels whose
neighboring disparities differ by <= max_diff are measured, and regions
with <= max_size pixels are reset to `invalid`.

OpenCV's sequential flood fill becomes label propagation with pointer
jumping (Shiloach-Vishkin style): each round takes the min label over
connected neighbors, then compresses twice via label = label[label].
Rounds are hop-doubling, so `iters=16` handles any region whose
flood-fill tree is up to ~2^16 deep — far beyond any <=100-pixel speckle,
and large regions only need their *size estimate* to exceed max_size,
which happens long before full convergence. The same machinery is reused
by the 3DMST segmentation (ops/segmentation.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["connected_components", "component_sizes", "filter_speckles"]


def connected_components(
    connect_right: jax.Array,
    connect_down: jax.Array,
    iters: int = 16,
) -> jax.Array:
    """Label 4-connected components. connect_right[y, x] joins (y,x)-(y,x+1)
    (shape (H, W-1) or (H, W) with last column ignored); connect_down joins
    (y,x)-(y+1,x). Returns int32 labels = min flat index in each component."""
    h, w = connect_right.shape[0], connect_down.shape[1]
    cr = connect_right[:, : w - 1]
    cd = connect_down[: h - 1, :]
    labels = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)

    def body(_, lab):
        right = lab[:, 1:]
        left = lab[:, :-1]
        lab = lab.at[:, :-1].min(jnp.where(cr, right, jnp.int32(2**30)))
        lab = lab.at[:, 1:].min(jnp.where(cr, left, jnp.int32(2**30)))
        down = lab[1:, :]
        up = lab[:-1, :]
        lab = lab.at[:-1, :].min(jnp.where(cd, down, jnp.int32(2**30)))
        lab = lab.at[1:, :].min(jnp.where(cd, up, jnp.int32(2**30)))
        flat = lab.reshape(-1)
        flat = flat[flat]  # pointer jump x2: hop doubling
        flat = flat[flat]
        return flat.reshape(h, w)

    return jax.lax.fori_loop(0, iters, body, labels)


def component_sizes(labels: jax.Array) -> jax.Array:
    """Per-pixel size of the pixel's component (scatter-add histogram)."""
    flat = labels.reshape(-1)
    counts = jnp.zeros((flat.shape[0],), jnp.int32).at[flat].add(1)
    return counts[flat].reshape(labels.shape)


def filter_speckles(
    disp: jax.Array,
    invalid: float,
    max_size: int,
    max_diff: float,
    iters: int = 16,
) -> jax.Array:
    """cv2.filterSpeckles semantics: connect 4-neighbors whose disparities
    differ by <= max_diff (both pixels must be valid, i.e. != invalid);
    components with <= max_size pixels are set to `invalid`."""
    valid = disp != invalid
    dr = jnp.abs(disp[:, 1:] - disp[:, :-1])
    dd = jnp.abs(disp[1:, :] - disp[:-1, :])
    cr = (dr <= max_diff) & valid[:, 1:] & valid[:, :-1]
    cd = (dd <= max_diff) & valid[1:, :] & valid[:-1, :]
    labels = connected_components(cr, cd, iters)
    sizes = component_sizes(labels)
    keep = valid & (sizes > max_size)
    return jnp.where(keep, disp, invalid)
