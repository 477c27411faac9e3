"""Multi-chip 3DMST (parallel/mst_mesh.py): candidate-sharded optimization
must EXACTLY reproduce single-chip mst_pms_optimize (candidates are keyed by
global index; ties break to the smallest index on both paths)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereomatch_tpu.config import MSTConfig
from stereomatch_tpu.native import build_forest, color_edge_weights
from stereomatch_tpu.ops.mst import forest_arrays, mst_pms_optimize


@pytest.fixture(scope="module")
def small_problem():
    rng = np.random.default_rng(12)
    h, w, d = 20, 28, 10
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    # smooth a bit so segmentation yields a handful of trees
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
    wr, wd_ = color_edge_weights(img)
    f = build_forest(wr, wd_, 500.0, 20, gamma=1 / 12.0, delta=4.0)
    fa = forest_arrays(f)
    xs = np.arange(w, dtype=np.float32)[None, :]
    d_true = 0.1 * xs + 2.0 + np.zeros((h, 1), np.float32)
    ds = np.arange(d, dtype=np.float32)[None, None, :]
    vol = np.minimum(np.abs(ds - d_true[..., None]) * 0.2, 0.5).astype(np.float32)
    return fa, jnp.asarray(vol)


def _cpu_devices(n):
    try:
        cpus = jax.devices("cpu")
    except RuntimeError:
        cpus = []
    if len(cpus) < n:
        pytest.skip("needs the virtual 8-device CPU mesh")
    return cpus


@pytest.mark.parametrize("n_dev", [2, 4])
def test_mesh_matches_single_chip(small_problem, n_dev):
    from stereomatch_tpu.parallel.mst_mesh import make_cand_mesh, mst_pms_optimize_mesh

    fa, vol = small_problem
    cpus = _cpu_devices(n_dev)
    cfg = MSTConfig(max_disp=10, iterations=6)
    key = jax.random.PRNGKey(3)

    a1, b1, c1, m1 = mst_pms_optimize(
        jax.device_put(key, cpus[0]), jax.device_put(vol, cpus[0]),
        jax.tree.map(lambda x: jax.device_put(x, cpus[0]), fa),
        cfg, max_neighbors=3, iterations=6,
    )
    mesh = make_cand_mesh(n_dev, devices=cpus[:n_dev])
    a2, b2, c2, m2 = mst_pms_optimize_mesh(
        key, vol, fa, mesh, cfg, max_neighbors=3, iterations=6
    )
    # candidate values are identical by construction (global-index RNG), but
    # tree_filter runs with different batch shapes, so costs differ at fp32
    # rounding (~1e-7) and a near-exact tie can flip to a different winner.
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-6)
    flipped = np.abs(np.asarray(c2) - np.asarray(c1)) > 1e-3
    assert flipped.mean() < 0.02, flipped.mean()
    same = ~flipped
    np.testing.assert_allclose(
        np.asarray(a2)[same], np.asarray(a1)[same], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b2)[same], np.asarray(b1)[same], rtol=1e-4, atol=1e-5
    )


def test_chunked_matches_unchunked(small_problem):
    """candidate_chunk (production memory bound) is result-identical."""
    fa, vol = small_problem
    cpus = _cpu_devices(1)
    cfg = MSTConfig(max_disp=10, iterations=5)
    key = jax.device_put(jax.random.PRNGKey(7), cpus[0])
    vol = jax.device_put(vol, cpus[0])
    fa = jax.tree.map(lambda x: jax.device_put(x, cpus[0]), fa)

    a1, b1, c1, m1 = mst_pms_optimize(
        key, vol, fa, cfg, max_neighbors=3, iterations=5
    )
    a2, b2, c2, m2 = mst_pms_optimize(
        key, vol, fa, cfg, max_neighbors=3, iterations=5, candidate_chunk=4
    )
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n_cand,n_node", [(2, 2), (1, 4), (4, 2)])
def test_sharded_volume_mesh_matches_single_chip(small_problem, n_cand, n_node):
    """Memory-sharded variant: the cost volume lives node-order-sharded
    across the "node" axis (each device's label_cost gathers are
    shard-local; one all_gather per candidate batch). Must match the
    single-chip result to the same tolerance as the replicated mesh."""
    from stereomatch_tpu.parallel.mst_mesh import (
        make_cand_node_mesh,
        mst_pms_optimize_mesh_sharded,
        volume_in_node_order,
    )

    fa, vol = small_problem
    cpus = _cpu_devices(n_cand * n_node)
    cfg = MSTConfig(max_disp=10, iterations=6)
    key = jax.random.PRNGKey(3)

    a1, b1, c1, m1 = mst_pms_optimize(
        jax.device_put(key, cpus[0]), jax.device_put(vol, cpus[0]),
        jax.tree.map(lambda x: jax.device_put(x, cpus[0]), fa),
        cfg, max_neighbors=3, iterations=6,
    )
    mesh = make_cand_node_mesh(n_cand, n_node, devices=cpus[: n_cand * n_node])
    vol_node = volume_in_node_order(vol, fa)
    a2, b2, c2, m2 = mst_pms_optimize_mesh_sharded(
        key, vol_node, fa, mesh, cfg, max_neighbors=3, iterations=6
    )
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-6)
    flipped = np.abs(np.asarray(c2) - np.asarray(c1)) > 1e-3
    assert flipped.mean() < 0.02, flipped.mean()
    same = ~flipped
    np.testing.assert_allclose(
        np.asarray(a2)[same], np.asarray(a1)[same], rtol=1e-4, atol=1e-5
    )


def test_mesh_seeded_refine_start_matches_single_chip(small_problem):
    """The SGBM-seeded configuration (init_state + truncated ladder,
    models/sgbm_mst.py) reproduces on the candidate mesh: same global-
    index RNG keying, so the refine_start ladder shortens K identically
    on both paths."""
    from stereomatch_tpu.ops.mst import plane_labels_from_disparity
    from stereomatch_tpu.parallel.mst_mesh import (
        make_cand_mesh,
        mst_pms_optimize_mesh,
    )

    fa, vol = small_problem
    cpus = _cpu_devices(2)
    cfg = MSTConfig(max_disp=10, iterations=4)
    key = jax.random.PRNGKey(7)
    # a plausible per-pixel seed: the volume's own WTA argmin image
    d_img = jnp.argmin(vol, axis=-1).astype(jnp.float32)
    a0, b0, c0 = plane_labels_from_disparity(d_img, fa)
    from stereomatch_tpu.ops.mst import label_cost, tree_filter

    mc0 = tree_filter(label_cost(vol, a0, b0, c0, fa, cfg.max_disp), fa,
                      cfg.carry_iters)
    init = (a0, b0, c0, mc0)

    a1, b1, c1, m1 = mst_pms_optimize(
        jax.device_put(key, cpus[0]), jax.device_put(vol, cpus[0]),
        jax.tree.map(lambda x: jax.device_put(x, cpus[0]), fa),
        cfg, max_neighbors=3, iterations=4, init_state=init,
        refine_start=2.0,
    )
    mesh = make_cand_mesh(2, devices=cpus[:2])
    a2, b2, c2, m2 = mst_pms_optimize_mesh(
        key, vol, fa, mesh, cfg, max_neighbors=3, iterations=4,
        init_state=init, refine_start=2.0,
    )
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-6)
    flipped = np.abs(np.asarray(c2) - np.asarray(c1)) > 1e-3
    assert flipped.mean() < 0.02, flipped.mean()
