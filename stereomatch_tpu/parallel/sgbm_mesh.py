"""Multi-chip SGBM: data-parallel frames over the mesh.

SGBM's DP couples every row to every other through the vertical/diagonal
path recurrences, so spatial sharding of ONE frame serializes into a
pipeline (deferred: band-pipelined SGBM with ppermute carry handoff,
GPipe-style over microbatched frames). The throughput workload the
BASELINE targets — the streaming FLIR sequence — shards perfectly by
FRAME: each device runs the exact single-chip engine on its own frames.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SGBMConfig
from ..ops.sgbm import sgbm_disparity

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["sgbm_batch_mesh"]


def sgbm_batch_mesh(mesh: Mesh, cfg: SGBMConfig = SGBMConfig(), axis: str = "frame"):
    """Build a jitted batched SGBM: (B, H, W) gray pairs sharded over the
    mesh's `axis`; B must be divisible by the axis size. Returns
    fn(left_batch, right_batch) -> (disparity (B, H, W), valid (B, H, W))."""

    def per_frame(l, r):
        out = sgbm_disparity(l, r, cfg)
        return out.disparity, out.valid

    def body(lb, rb):
        return jax.vmap(per_frame)(lb, rb)

    spec = P(axis)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec))
    return jax.jit(fn)
