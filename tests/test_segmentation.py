"""Pure-JAX Boruvka segmentation (ops/segmentation.py)."""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.ops.segmentation import boruvka_segment, segment_image


def test_flat_image_single_component():
    img = np.full((24, 32, 3), 100.0, np.float32)
    labels = np.asarray(segment_image(jnp.asarray(img), c=5000.0, min_size=4))
    assert len(np.unique(labels)) == 1


def test_three_regions():
    h, w = 32, 48
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 3] = 30.0
    img[:, w // 3 : 2 * w // 3] = 130.0
    img[:, 2 * w // 3 :] = 230.0
    labels = np.asarray(segment_image(jnp.asarray(img), c=200.0, min_size=8))
    # each band maps to one dominant label, and bands differ
    l0 = labels[:, : w // 3 - 1]
    l1 = labels[:, w // 3 + 1 : 2 * w // 3 - 1]
    l2 = labels[:, 2 * w // 3 + 1 :]
    for band in (l0, l1, l2):
        vals, counts = np.unique(band, return_counts=True)
        assert counts.max() / band.size > 0.9
    assert np.median(l0) != np.median(l1) != np.median(l2)


def test_min_size_merge(rng):
    """Speckles smaller than min_size must be absorbed."""
    h, w = 24, 24
    img = np.full((h, w, 3), 50.0, np.float32)
    img[10:12, 10:12] = 250.0  # 4-pixel outlier blob
    labels = np.asarray(segment_image(jnp.asarray(img), c=100.0, min_size=16))
    assert len(np.unique(labels)) == 1  # blob merged away
