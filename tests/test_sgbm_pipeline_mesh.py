"""Band-pipelined multi-chip SGBM == single-chip SGBM, frame by frame."""

import numpy as np
import jax
import pytest

from stereomatch_tpu.config import SGBMConfig
from stereomatch_tpu.ops.sgbm import sgbm_disparity
from stereomatch_tpu.parallel import make_mesh
from stereomatch_tpu.parallel.sgbm_pipeline import sgbm_pipeline_mesh


@pytest.fixture(scope="module")
def mesh4():
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = []
    if len(cpus) < 4:
        pytest.skip("needs the virtual 8-device CPU mesh")
    import numpy as _np
    from jax.sharding import Mesh

    return Mesh(_np.array(cpus[:4]), ("tile",))


def _assert_frame_close(disp_f, valid_f, ref):
    """Band-local fp32 cost sums can flip a near-exact argmin tie on
    isolated pixels (see sgbm_pipeline.py docstring) — tolerate a tiny
    flip fraction instead of asserting bitwise equality."""
    flipped = (valid_f != np.asarray(ref.valid)) | (
        np.abs(disp_f - np.asarray(ref.disparity)) > 1e-4
    )
    assert flipped.mean() < 0.002, flipped.sum()


def test_pipelined_sgbm_matches_single(mesh4, rng):
    b, h, w = 3, 64, 96  # h divisible by n=4 -> 16-row bands
    base = (rng.random((b, h, w + 8)) * 255).astype(np.float32)
    left, right = base[..., :w], base[..., 5 : 5 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=5)
    fn = sgbm_pipeline_mesh(mesh4, cfg)
    disp, valid = fn(left, right)
    disp, valid = np.asarray(disp), np.asarray(valid)
    for f in range(b):
        ref = sgbm_disparity(
            jax.device_put(left[f], jax.devices("cpu")[0]),
            jax.device_put(right[f], jax.devices("cpu")[0]),
            cfg,
        )
        _assert_frame_close(disp[f], valid[f], ref)


def test_pipelined_sgbm_5path_matches_single(mesh4, rng):
    """num_paths=5 (MODE_SGBM set): no up sweep — the pipelined schedule
    must still equal single-chip exactly."""
    b, h, w = 2, 64, 96
    base = (rng.random((b, h, w + 8)) * 255).astype(np.float32)
    left, right = base[..., :w], base[..., 5 : 5 + w]
    cfg = SGBMConfig(min_disp=0, num_disp=16, block_size=5, num_paths=5)
    fn = sgbm_pipeline_mesh(mesh4, cfg)
    disp, valid = fn(left, right)
    disp, valid = np.asarray(disp), np.asarray(valid)
    for f in range(b):
        ref = sgbm_disparity(
            jax.device_put(left[f], jax.devices("cpu")[0]),
            jax.device_put(right[f], jax.devices("cpu")[0]),
            cfg,
        )
        _assert_frame_close(disp[f], valid[f], ref)
