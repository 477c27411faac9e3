"""End-to-end facade tests: every engine through stereomatch_tpu.pipelines
on a small synthetic scene (sanity: shape, finiteness, rough accuracy)."""

import numpy as np
import pytest

from stereomatch_tpu import pipelines
from stereomatch_tpu.config import (
    CensusConfig,
    CostVolumeConfig,
    CostVolumePipelineConfig,
    DenoiseConfig,
    GuidedFilterConfig,
    MSTConfig,
    PatchMatchConfig,
    SGBMConfig,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    h, w, d = 48, 80, 6
    base = (rng.random((h, w + d, 3)) * 255).astype(np.float32)
    base = (base + np.roll(base, 1, 1) + np.roll(base, 1, 0)) / 3
    # left(x) = base(x), right(x) = base(x + d), so left(x) = right(x - d):
    # constant LEFT-view disparity d everywhere
    left = base[:, :w]
    right = base[:, d : d + w]
    return left, right, float(d)


def _check(disp, shape, lo, hi):
    assert disp.shape == shape
    assert np.isfinite(disp).all()
    assert disp.min() >= lo - 1e-3 and disp.max() <= hi + 1e-3


def test_costvolume_pipeline(scene):
    left, right, d = scene
    cfg = CostVolumePipelineConfig(
        volume=CostVolumeConfig(min_disp=0, max_disp=15),
        guided=GuidedFilterConfig(radius=3, slab=8),
        denoise=DenoiseConfig(iterations=10),
    )
    dl, dr = pipelines.costvolume_pipeline(left, right, cfg)
    _check(dl, left.shape[:2], 0, 15)
    inner = dl[10:-10, 20:-10]
    assert np.abs(inner - d).mean() < 1.5


def test_sgbm_pipeline(scene):
    left, right, d = scene
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=5)
    disp = pipelines.sgbm_pipeline(left, right, cfg)
    valid = disp >= 0
    assert valid.mean() > 0.4
    assert np.abs(disp[valid] - d).mean() < 1.0


def test_census_pipeline(scene):
    left, right, d = scene
    disp = pipelines.census_pipeline(right, left, CensusConfig(d_max=15))
    # census computes the RIGHT-view disparity of (left,right); by passing
    # the swapped pair, the "right" view is our left image
    h, w = left.shape[:2]
    assert disp.shape == (h, w)


def test_patchmatch_pipeline(scene):
    left, right, d = scene
    cfg = PatchMatchConfig(
        min_disp=0, max_disp=15, window_size=15, tap_stride=3, iterations=6
    )
    dl, dr = pipelines.patchmatch_pipeline(left, right, cfg)
    _check(dl, left.shape[:2], 0, 15)
    inner = dl[10:-10, 20:-10]
    assert (np.abs(inner - d) < 1.5).mean() > 0.6


def test_mst_pipeline(scene):
    left, right, d = scene
    cfg = MSTConfig(max_disp=16, iterations=25, min_cc_size=60, c=800.0)
    dl, dr = pipelines.mst_pipeline(left, right, cfg=cfg)
    _check(dl, left.shape[:2], 0, 16)
    inner = dl[10:-10, 20:-10]
    # LR-checked zeros excluded
    m = inner > 0
    assert m.mean() > 0.3
    assert np.abs(inner[m] - d).mean() < 2.5
