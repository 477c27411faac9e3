"""Parity for the Pallas segmented-scan backend of the 3DMST tree filter
(ops/mst_scan_pallas.py, interpret mode off-TPU): the fused VMEM-carry
kernel must reproduce the XLA blocked scan and the reference two-pass
recurrence (src/Stereo3DMST.cpp:120-158) to the method's fp32 noise
floor."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereomatch_tpu.config import MSTConfig
from stereomatch_tpu.native import build_forest, color_edge_weights
from stereomatch_tpu.ops.mst import (
    _make_scan_maps,
    _segmented_cumsum_mm,
    forest_arrays,
    mst_pms_optimize,
    tree_filter,
)
from stereomatch_tpu.ops.mst_scan_pallas import (
    build_packed_scan_maps,
    segmented_cumsum_pallas,
)


def _random_reset(rng, m, mean_seg):
    reset = rng.random(m) < 1.0 / mean_seg
    reset[0] = True
    return reset


@pytest.mark.parametrize(
    "m,mean_seg,batch",
    [
        (1000, 7, ()),          # short segments, non-multiple length, no batch
        (4096, 900, (3,)),      # segments spanning many 256-blocks
        (700, 40, (13,)),       # batch above one sublane tile
        (256, 256, (2, 2)),     # exactly one block, nested batch dims
    ],
)
def test_segmented_cumsum_pallas_matches_xla(rng, m, mean_seg, batch):
    reset = _random_reset(rng, m, mean_seg)
    x = (rng.random(batch + (m,)) - 0.3).astype(np.float32)
    want = np.asarray(
        _segmented_cumsum_mm(jnp.asarray(x), _make_scan_maps(reset))
    )
    got = np.asarray(
        segmented_cumsum_pallas(
            jnp.asarray(x),
            jnp.asarray(build_packed_scan_maps(reset)),
            interpret=True,
        )
    )
    assert got.shape == x.shape
    # identical blocking; only the inter-block carry association differs
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_segmented_cumsum_pallas_oracle(rng):
    """Against a direct per-segment numpy cumsum (independent oracle)."""
    m = 2000
    reset = _random_reset(rng, m, 23)
    x = (rng.random((2, m)) - 0.5).astype(np.float32)
    seg = np.cumsum(reset) - 1
    want = np.empty_like(x, np.float64)
    for s in range(seg.max() + 1):
        sel = seg == s
        want[:, sel] = np.cumsum(x[:, sel].astype(np.float64), axis=1)
    got = np.asarray(
        segmented_cumsum_pallas(
            jnp.asarray(x),
            jnp.asarray(build_packed_scan_maps(reset)),
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_tree_filter_pallas_backend_parity(rng):
    h, w = 16, 20
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    wr, wd = color_edge_weights(img)
    for delta in (1.0, 4.0):  # small delta forces many segments + carries
        f = build_forest(wr, wd, 300.0, 4, gamma=1 / 12.0, delta=delta)
        fa = forest_arrays(f)
        cost = rng.random((3, h * w)).astype(np.float32) * 0.5
        want = np.asarray(tree_filter(jnp.asarray(cost), fa))
        got = np.asarray(
            tree_filter(jnp.asarray(cost), fa, 2, "pallas", interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mst_optimize_pallas_backend_smoke(rng):
    """mst_pms_optimize wired end-to-end through the Pallas scans: the
    per-pixel min costs must track the XLA backend (label argmin can flip
    on fp32 ties, so the gate is on cost closeness, not labels)."""
    import jax

    h, w, d = 10, 12, 16
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    wr, wd = color_edge_weights(img)
    f = build_forest(wr, wd, 300.0, 4, gamma=1 / 12.0, delta=4.0)
    fa = forest_arrays(f)
    vol = jnp.asarray(rng.random((h, w, d)).astype(np.float32) * 0.5)
    kw = dict(max_neighbors=2, iterations=2)
    cfg = MSTConfig(max_disp=d)
    _, _, _, mc_x = mst_pms_optimize(jax.random.PRNGKey(0), vol, fa, cfg, **kw)
    cfgp = MSTConfig(max_disp=d, scan_backend="pallas")
    _, _, _, mc_p = mst_pms_optimize(
        jax.random.PRNGKey(0), vol, fa, cfgp, scan_interpret=True, **kw
    )
    mc_x, mc_p = np.asarray(mc_x), np.asarray(mc_p)
    assert np.isfinite(mc_p).all()
    np.testing.assert_allclose(mc_p, mc_x, rtol=1e-3, atol=1e-3)
