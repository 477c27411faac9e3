"""Mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "tile_rows_sharding"]


def make_mesh(
    n_tile: int | None = None, n_frame: int = 1, devices=None
) -> Mesh:
    """Build a (frame, tile) mesh. Default: all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = len(devices) // n_frame
    assert n_frame * n_tile <= len(devices), (n_frame, n_tile, len(devices))
    arr = np.array(devices[: n_frame * n_tile]).reshape(n_frame, n_tile)
    return Mesh(arr, ("frame", "tile"))


def tile_rows_sharding(mesh: Mesh) -> NamedSharding:
    """Images (H, W[, C]) sharded by rows over the tile axis."""
    return NamedSharding(mesh, P("tile"))
