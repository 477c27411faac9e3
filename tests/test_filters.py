"""Box-filter unit tests (ops/filters.py).

Oracles are naive numpy window sums. Specifically covers the `count`
normalization mode on non-(0,1) axes (round-1 latent bug: the tap count was
accumulated over enumerate() indices instead of the requested axes).
"""

import numpy as np
import jax.numpy as jnp

from stereomatch_tpu.ops.filters import box_filter, box_filter_sum


def _naive_mean_count(x: np.ndarray, radius: int, axes) -> np.ndarray:
    """Window mean normalized by the number of in-bounds taps."""
    num = x.astype(np.float64)
    cnt = np.ones_like(num)
    for ax in axes:
        n = x.shape[ax]
        acc_n = np.zeros_like(num)
        acc_c = np.zeros_like(cnt)
        for off in range(-radius, radius + 1):
            idx = np.arange(n) + off
            ok = (idx >= 0) & (idx < n)
            take = np.take(num, np.clip(idx, 0, n - 1), axis=ax)
            takec = np.take(cnt, np.clip(idx, 0, n - 1), axis=ax)
            mask_shape = [1] * x.ndim
            mask_shape[ax] = n
            m = ok.reshape(mask_shape)
            acc_n += np.where(m, take, 0.0)
            acc_c += np.where(m, takec, 0.0)
        num, cnt = acc_n, acc_c
    return num / cnt


def test_box_filter_sum_matches_naive(rng):
    x = rng.standard_normal((7, 11)).astype(np.float32)
    r = 2
    out = np.asarray(box_filter_sum(jnp.asarray(x), r, 1))
    ref = np.zeros_like(x)
    for off in range(-r, r + 1):
        idx = np.arange(11) + off
        ok = (idx >= 0) & (idx < 11)
        ref += np.where(ok[None, :], x[:, np.clip(idx, 0, 10)], 0.0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_box_filter_count_axes01(rng):
    x = rng.standard_normal((9, 13)).astype(np.float32)
    out = np.asarray(box_filter(jnp.asarray(x), 2, (0, 1), mode="count"))
    ref = _naive_mean_count(x, 2, (0, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_box_filter_count_nonprefix_axes(rng):
    # axes=(1, 2) on a 3-D array — the round-1 bug normalized this wrong
    x = rng.standard_normal((4, 9, 13)).astype(np.float32)
    out = np.asarray(box_filter(jnp.asarray(x), 2, (1, 2), mode="count"))
    ref = _naive_mean_count(x, 2, (1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_box_filter_count_single_axis1(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    out = np.asarray(box_filter(jnp.asarray(x), 3, (1,), mode="count"))
    ref = _naive_mean_count(x, 3, (1,))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_box_filter_count_interior_equals_zero_mode(rng):
    # away from borders, count mode == fixed 1/(2r+1)^2 normalization
    x = rng.standard_normal((12, 12)).astype(np.float32)
    r = 2
    a = np.asarray(box_filter(jnp.asarray(x), r, (0, 1), mode="count"))
    b = np.asarray(box_filter(jnp.asarray(x), r, (0, 1), mode="zero"))
    np.testing.assert_allclose(a[r:-r, r:-r], b[r:-r, r:-r], rtol=1e-4, atol=1e-5)
