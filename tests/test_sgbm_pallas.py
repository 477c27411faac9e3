"""Pallas SGBM aggregation == XLA scan aggregation (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereomatch_tpu.ops.sgbm import aggregate_8path
from stereomatch_tpu.ops.sgbm_pallas import aggregate_8path_pallas


@pytest.mark.parametrize("num_paths", [4, 8])
def test_pallas_matches_scan(rng, num_paths):
    cost = (rng.random((16, 24, 8)) * 50).astype(np.float32)
    p1, p2 = 7.0, 29.0
    ref = np.asarray(aggregate_8path(jnp.asarray(cost), p1, p2, num_paths))
    got = np.asarray(
        aggregate_8path_pallas(jnp.asarray(cost), p1, p2, num_paths, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("row_chunk,col_chunk", [(8, 8), (5, 16), (64, 64)])
def test_pallas_chunked_matches_scan(rng, row_chunk, col_chunk):
    """Chunked passes (carry handed between pallas_calls as an explicit
    operand) == single-call program == XLA scan, including chunk sizes
    that do not divide the frame (5 rows of 16) and chunks larger than
    the frame (no-op path)."""
    cost = (rng.random((16, 24, 8)) * 50).astype(np.float32)
    p1, p2 = 7.0, 29.0
    ref = np.asarray(aggregate_8path(jnp.asarray(cost), p1, p2, 8))
    got = np.asarray(
        aggregate_8path_pallas(
            jnp.asarray(cost), p1, p2, 8, interpret=True,
            row_chunk=row_chunk, col_chunk=col_chunk,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
