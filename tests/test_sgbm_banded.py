"""Band-streamed SGBM == monolithic SGBM (exact, including the remainder
band and the disp12/uniqueness post)."""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.config import SGBMConfig
from stereomatch_tpu.ops.sgbm import sgbm_disparity, sgbm_disparity_banded


def test_banded_matches_monolithic(rng):
    h, w = 70, 96  # h deliberately NOT divisible by band_rows
    base = (rng.random((h, w + 8)) * 255).astype(np.float32)
    left, right = base[:, :w], base[:, 5 : 5 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=5)
    mono = sgbm_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    band = sgbm_disparity_banded(jnp.asarray(left), jnp.asarray(right), cfg, band_rows=16)
    np.testing.assert_array_equal(np.asarray(mono.valid), np.asarray(band.valid))
    np.testing.assert_allclose(
        np.asarray(mono.disparity), np.asarray(band.disparity), atol=1e-5
    )


def test_banded_matches_monolithic_4path(rng):
    h, w = 48, 80
    base = (rng.random((h, w + 6)) * 255).astype(np.float32)
    left, right = base[:, :w], base[:, 4 : 4 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=3, num_paths=4)
    mono = sgbm_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    band = sgbm_disparity_banded(jnp.asarray(left), jnp.asarray(right), cfg, band_rows=24)
    np.testing.assert_array_equal(np.asarray(mono.valid), np.asarray(band.valid))
    np.testing.assert_allclose(
        np.asarray(mono.disparity), np.asarray(band.disparity), atol=1e-5
    )
