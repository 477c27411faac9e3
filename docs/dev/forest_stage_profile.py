"""Per-stage timing of the on-device forest build (ops/device_forest.py)
through the tunneled TPU chip — finds where the 2x-views ~15 s/view
(round-5 staged probe) actually goes so optimization lands on the
dominant stage, not a guess.

Stages (same decomposition as the module docstring):
  1. segmentation      ops.segmentation.boruvka_segment + label compress
  2. component MST     _component_mst (Boruvka over within-label edges)
  3. euler tour        _euler_tour (successor build + Wyllie ranking)
  4. depths/split      _ancestor_doubling + band split + seg compress
  5. order+maps        stage-5 sorts, CSR adjacency, scan maps (the rest)
  full                 build_forest_device end-to-end (cross-check: the
                       stage sum misses only fusion at the boundaries)

Each stage is wrapped in its own jit and timed warm (compile excluded)
with a jitted scalar force (np.asarray(big) would measure D2H,
CLAUDE.md). Run: python docs/dev/forest_stage_profile.py [H W]
Writes JSON to stdout (one line, last).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from stereomatch_tpu.ops import device_forest as df
from stereomatch_tpu.ops.segmentation import boruvka_segment


def _force(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1024]))


def _time(fn, *args, reps=2):
    out = fn(*args)
    _force(jax.tree.leaves(out)[0])  # compile + first run
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _force(jax.tree.leaves(out)[0])
    return (time.time() - t0) / reps, out


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    n = h * w
    rng = np.random.default_rng(0)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    for _ in range(3):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
    wr = jax.block_until_ready(
        jnp.asarray(np.abs(img[:, 1:] - img[:, :-1]).sum(-1)))
    wd = jax.block_until_ready(
        jnp.asarray(np.abs(img[1:] - img[:-1]).sum(-1)))
    tmax = 1 << int(np.ceil(np.log2(max(256, 4 * n // 200))))
    adj_cap = 8 * tmax
    logn = df._ceil_log2(n) + 1
    out = {"h": h, "w": w, "tmax": tmax,
           "backend": jax.default_backend()}

    # --- stage 1: segmentation ---
    seg = jax.jit(lambda a, b: df._compress_conv(
        boruvka_segment(a, b, 5000.0, 200, rounds=12,
                        merge_rounds=6).reshape(-1)))
    t, lab = _time(seg, wr, wd)
    out["s1_segmentation_s"] = round(t, 2)

    ea, eb = df._grid_edges_idx(h, w)
    ew = jnp.concatenate(
        [wr.reshape(-1), wd.reshape(-1)]).astype(jnp.float32)

    # --- stage 2: component MST ---
    mst = jax.jit(lambda l: df._component_mst(l, ea, eb, ew, n, hw=(h, w)))
    t, tree_edge = _time(mst, lab)
    out["s2_component_mst_s"] = round(t, 2)

    # --- stage 3: euler tour (successors + Wyllie + parents/sizes) ---
    tour = jax.jit(lambda te, l: df._euler_tour(te, l, ea, eb, h, w))
    t, tr = _time(tour, tree_edge, lab)
    out["s3_euler_tour_s"] = round(t, 2)

    # --- stage 4: depths via ancestor doubling ---
    parent = tr["parent"]
    pw = jnp.zeros(n, jnp.float32).at[
        jnp.where(tr["down"], tr["head"], n)].set(
        jnp.where(tr["down"], ew[tr["edge_of"]], 0.0), mode="drop")

    def depths(par, pwv):
        return df._ancestor_doubling(
            par,
            (jnp.where(par == jnp.arange(n), 0, 1).astype(jnp.int32),
             jnp.float32(1.0 / 12.0) * pwv),
            logn,
        )

    t, _ = _time(jax.jit(depths), parent, pw)
    out["s4_ancestor_doubling_s"] = round(t, 2)

    # --- full build (stage 5 = full - (1..4) up to fusion noise) ---
    t, raw = _time(
        lambda a, b: df.build_forest_device(a, b, tmax=tmax,
                                            adj_cap=adj_cap), wr, wd)
    out["full_build_s"] = round(t, 2)
    out["s5_order_maps_s_est"] = round(
        max(0.0, t - sum(out[k] for k in
                         ("s1_segmentation_s", "s2_component_mst_s",
                          "s3_euler_tour_s", "s4_ancestor_doubling_s"))),
        2)
    out["trees"] = int(raw["num_trees_actual"])
    # tour-depth context: biggest tree (governs Wyllie round count)
    tsz = np.asarray(raw["tree_start"])
    out["largest_tree_nodes"] = int(np.diff(tsz).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
