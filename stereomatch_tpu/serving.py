"""Production serving layer: AOT-compiled frame pipelines + async executor.

The reference deploys each engine as a per-frame executable main that
re-initializes everything on every invocation (src/stereo_opencv.cpp:93-176
reloads images, reallocates GpuMats and re-runs cv::cuda kernels per call;
src/stereo_Yin.cpp:150-210 re-reads the cost volume and rebuilds the
segment forest per frame). A TPU serving path wants the opposite shape:

- compile ONCE ahead of time, from shape specs, before any frame exists
  (`jax.jit(...).lower(...).compile()` on `jax.ShapeDtypeStruct`s), so
  the first request pays zero compile latency;
- keep the executable + its cost/memory analysis around as a first-class
  object (capacity planning: FLOPs, bytes accessed, peak HBM);
- exploit XLA's async dispatch for the steady state: enqueue frame N+1's
  host->device transfer and computation while frame N is still on the
  chip, and only materialize results on collect. With the fused
  SGBM+3DMST frame program (models/sgbm_mst.py) the whole north-star
  composition is one executable, so the stream is: upload pair ->
  one program -> download maps, double-buffered.

No new math lives here — this wraps the frame programs the engines
already expose.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import MSTConfig, SGBMConfig

__all__ = [
    "CompiledPipeline",
    "StereoStreamServer",
    "compile_sgbm_mst_server",
]


def _spec(x) -> jax.ShapeDtypeStruct:
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    a = jnp.asarray(x) if not hasattr(x, "shape") else x
    return jax.ShapeDtypeStruct(a.shape, a.dtype)


class CompiledPipeline:
    """A frame function AOT-compiled for fixed shapes.

    `example_args` may be real arrays OR `jax.ShapeDtypeStruct`s — the
    serving path compiles from specs alone, before any input exists.
    The XLA executable's own cost model is exposed for capacity
    planning (`flops`, `bytes_accessed`, `peak_hbm_bytes`).
    """

    def __init__(
        self,
        fn: Callable,
        example_args: Sequence[Any],
        donate_argnums: Sequence[int] = (),
    ):
        self._specs = tuple(_spec(a) for a in example_args)
        jitted = jax.jit(fn, donate_argnums=tuple(donate_argnums))
        self._lowered = jitted.lower(*self._specs)
        self._compiled = self._lowered.compile()

    @property
    def in_specs(self) -> tuple[jax.ShapeDtypeStruct, ...]:
        return self._specs

    def _analysis(self) -> dict:
        try:
            ca = self._compiled.cost_analysis()
            # older jax returns a per-device list
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            return dict(ca) if ca else {}
        except Exception:
            return {}

    @property
    def flops(self) -> float:
        return float(self._analysis().get("flops", 0.0))

    @property
    def bytes_accessed(self) -> float:
        return float(self._analysis().get("bytes accessed", 0.0))

    @property
    def peak_hbm_bytes(self) -> int:
        try:
            ma = self._compiled.memory_analysis()
            return int(
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
            )
        except Exception:
            return 0

    def __call__(self, *args):
        for a, s in zip(args, self._specs):
            if tuple(a.shape) != tuple(s.shape):
                raise ValueError(
                    f"input shape {tuple(a.shape)} != compiled spec "
                    f"{tuple(s.shape)}; serving executables are "
                    f"fixed-shape — build one per resolution"
                )
        return self._compiled(*args)


@dataclass
class _Pending:
    ticket: int
    outputs: Any


class StereoStreamServer:
    """Async double-buffered executor over one compiled frame program.

    `submit()` enqueues the host->device upload and the frame program and
    returns a ticket IMMEDIATELY (XLA dispatch is async); `collect()`
    blocks only on that frame's outputs and returns numpy arrays. With
    `capacity` >= 2 the upload + compute of frame N+1 overlap the compute
    of frame N — the steady-state rate is max(upload, compute), not
    their sum. Submitting beyond `capacity` first collects the oldest
    frame (backpressure), bounding device memory to `capacity` frames.
    """

    def __init__(self, pipeline: CompiledPipeline, capacity: int = 2):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.pipeline = pipeline
        self.capacity = capacity
        self._queue: deque[_Pending] = deque()
        self._next = 0
        self._done: dict[int, Any] = {}

    def submit(self, *frame_args) -> int:
        if len(self._queue) >= self.capacity:
            self._finish(self._queue.popleft())
        dev = [
            a if isinstance(a, jax.Array) else jax.device_put(jnp.asarray(a))
            for a in frame_args
        ]
        out = self.pipeline(*dev)
        ticket = self._next
        self._next += 1
        self._queue.append(_Pending(ticket, out))
        return ticket

    def _finish(self, p: _Pending) -> None:
        self._done[p.ticket] = jax.tree_util.tree_map(np.asarray, p.outputs)

    def collect(self, ticket: int):
        """Block until `ticket`'s frame is done; returns numpy pytree."""
        while ticket not in self._done:
            if not self._queue:
                raise KeyError(f"unknown or already-collected ticket {ticket}")
            self._finish(self._queue.popleft())
        return self._done.pop(ticket)

    def drain(self) -> list[Any]:
        """Collect every outstanding frame, in submission order."""
        tickets = [p.ticket for p in self._queue] + sorted(self._done)
        return [self.collect(t) for t in sorted(set(tickets))]


def compile_sgbm_mst_server(
    h: int,
    w: int,
    cfg: MSTConfig | None = None,
    sgbm_cfg: SGBMConfig | None = None,
    fine_iterations: int = 4,
    refine_start: float | None = 2.0,
    max_neighbors: int = 2,
    right_seed: str = "disp2",
    capacity: int = 2,
    on_tpu: bool | None = None,
) -> StereoStreamServer:
    """AOT-compile the production north-star pipeline for an HxW stream.

    The frame program is the fused SGBM-seeded 3DMST composition
    (models/sgbm_mst.py::_sgbm_mst_frame_fused) with the on-device
    adgrad+guided cost-volume build in front: BGR pair in, (left, right)
    disparity maps out, one XLA executable, zero per-frame host work.
    Config defaults to `config.production_mst_config` (PARITY.md
    "Production seeded config"). Frames are keyed by submission index so
    the RNG stream is reproducible per frame.
    """
    from .config import production_mst_config
    from .models.mst import _fused_capacities
    from .models.sgbm_mst import _default_sgbm_cfg, _sgbm_mst_frame_fused
    from .apps.stereo_yin import builtin_cost_volumes

    if cfg is None:
        if on_tpu is None:
            on_tpu = jax.default_backend() == "tpu"
        cfg = production_mst_config(128, on_tpu=on_tpu, forest_backend="device")
    if sgbm_cfg is None:
        sgbm_cfg = _default_sgbm_cfg(cfg)
    d = cfg.max_disp
    tmax, adj_cap = _fused_capacities(h, w, cfg)

    def frame(left_bgr, right_bgr, key):
        vl, vr = builtin_cost_volumes(
            left_bgr[..., ::-1], right_bgr[..., ::-1], d
        )
        return _sgbm_mst_frame_fused(
            left_bgr, right_bgr, vl, vr, key, cfg, sgbm_cfg,
            fine_iterations, refine_start, max_neighbors, h, w,
            tmax, adj_cap, right_seed,
        )

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    pipe = CompiledPipeline(frame, (img, img, key))
    server = StereoStreamServer(pipe, capacity=capacity)

    def submit_pair(left_bgr, right_bgr, seed: int | None = None):
        s = server._next if seed is None else seed
        return server.submit(left_bgr, right_bgr, jax.random.PRNGKey(s))

    server.submit_pair = submit_pair  # type: ignore[attr-defined]
    return server
