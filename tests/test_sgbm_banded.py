"""Band-streamed SGBM == monolithic SGBM (same math; the band driver
recomputes block-sum cumsums over band strips, whose fp32 prefixes can
differ from the monolithic ones by 1 ulp — a near-exact cost tie may then
flip to a different disparity on isolated pixels, so the comparisons
tolerate a tiny flip fraction)."""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.config import SGBMConfig
from stereomatch_tpu.ops.sgbm import sgbm_disparity, sgbm_disparity_banded


def _assert_banded_close(mono, band):
    mv, bv = np.asarray(mono.valid), np.asarray(band.valid)
    md, bd = np.asarray(mono.disparity), np.asarray(band.disparity)
    flipped = (mv != bv) | (np.abs(md - bd) > 1e-5)
    assert flipped.mean() < 0.002, (
        f"{flipped.sum()} pixels differ (beyond rare fp tie flips): "
        f"max {np.abs(md - bd).max():.4f}"
    )


def test_banded_matches_monolithic(rng):
    h, w = 70, 96  # h deliberately NOT divisible by band_rows
    base = (rng.random((h, w + 8)) * 255).astype(np.float32)
    left, right = base[:, :w], base[:, 5 : 5 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=5)
    mono = sgbm_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    band = sgbm_disparity_banded(jnp.asarray(left), jnp.asarray(right), cfg, band_rows=16)
    _assert_banded_close(mono, band)


def test_banded_matches_monolithic_4path(rng):
    h, w = 48, 80
    base = (rng.random((h, w + 6)) * 255).astype(np.float32)
    left, right = base[:, :w], base[:, 4 : 4 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=3, num_paths=4)
    mono = sgbm_disparity(jnp.asarray(left), jnp.asarray(right), cfg)
    band = sgbm_disparity_banded(jnp.asarray(left), jnp.asarray(right), cfg, band_rows=24)
    _assert_banded_close(mono, band)
