"""Multi-chip SPMD layer: mesh construction, halo exchange, tiled pipelines.

The reference is single-process single-GPU (SURVEY.md §2.4-2.5); its
parallelism axes (OpenMP rows, CUDA blocks, disparity-slice streams,
dual-stream L/R) map onto a `jax.sharding.Mesh` here:

  axis "frame" — data parallel over stereo pairs (the FLIR sequence,
                 streaming-video config)
  axis "tile"  — spatial tiles of the image (rows); windowed ops exchange
                 halos over ICI with `ppermute`
  (disparity-slab sharding of the H x W x D volume composes with "tile"
  for the largest volumes — WTA then reduces over the slab axis.)
"""

from .mesh import make_mesh, tile_rows_sharding  # noqa: F401
from .halo import halo_exchange_rows  # noqa: F401
from .tiled import tiled_cost_volume_batch, tiled_cost_volume_stereo  # noqa: F401
from .sgbm_mesh import sgbm_batch_mesh  # noqa: F401
from .sgbm_pipeline import sgbm_pipeline_mesh  # noqa: F401
