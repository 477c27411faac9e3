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
    "StagedPipeline",
    "StereoStreamServer",
    "VideoStreamServer",
    "compile_sgbm_mst_server",
    "compile_mst_video_server",
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


class StagedPipeline:
    """A frame function split into a CHAIN of smaller AOT executables
    handed device arrays (no host sync between stages — XLA dispatch is
    async, so the chain enqueues like one program).

    Same interface as CompiledPipeline, so the stream executors accept
    either. Use it when one monolithic frame program is too big for the
    worker: program-size limits, preemption-prone fleets — and this
    environment's tunneled chip, whose worker dies executing the fused
    full-size SGBM+3DMST program while every stage of the staged chain
    runs (bench.py STAGED_CODE measures the staged composition at the
    headline 1280x960x128). Cost/memory analyses aggregate over stages
    (peak HBM is the max stage peak plus chained intermediates — an
    upper-bound sum is reported).
    """

    def __init__(self, stages: Sequence[CompiledPipeline],
                 driver: Callable[..., Any],
                 in_specs: Sequence[jax.ShapeDtypeStruct]):
        self.stages = tuple(stages)
        self._driver = driver
        self._specs = tuple(in_specs)

    @property
    def in_specs(self) -> tuple[jax.ShapeDtypeStruct, ...]:
        return self._specs

    @property
    def flops(self) -> float:
        return float(sum(s.flops for s in self.stages))

    @property
    def bytes_accessed(self) -> float:
        return float(sum(s.bytes_accessed for s in self.stages))

    @property
    def peak_hbm_bytes(self) -> int:
        return int(sum(s.peak_hbm_bytes for s in self.stages))

    def __call__(self, *args):
        for a, s in zip(args, self._specs):
            if tuple(a.shape) != tuple(s.shape):
                raise ValueError(
                    f"input shape {tuple(a.shape)} != compiled spec "
                    f"{tuple(s.shape)}; serving executables are "
                    f"fixed-shape — build one per resolution"
                )
        return self._driver(*args)


def _staged_vol_pipe(h: int, w: int, d: int) -> CompiledPipeline:
    """Stage executable: BGR pair -> (left, right) cost volumes."""
    from .apps.stereo_yin import builtin_cost_volumes

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)

    def vols(lb, rb):
        return builtin_cost_volumes(lb[..., ::-1], rb[..., ::-1], d)

    return CompiledPipeline(vols, (img, img))


def _staged_seed_pipe(h: int, w: int, sgbm_cfg: SGBMConfig,
                      right_seed: str) -> CompiledPipeline:
    """Stage executable: BGR pair -> (left, right) SGBM seed maps."""
    from .models.sgbm_mst import _gray_from_bgr, _seed_pair

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)

    def seeds(lb, rb):
        return _seed_pair(
            _gray_from_bgr(lb), _gray_from_bgr(rb), sgbm_cfg, right_seed
        )

    return CompiledPipeline(seeds, (img, img))


def _staged_refine_pipe(cfg: MSTConfig, h: int, w: int, d: int, tmax: int,
                        adj_cap: int, iterations: int, refine_start,
                        max_neighbors: int, view_idx: int,
                        clip_span: float | None = None) -> CompiledPipeline:
    """Stage executable: one view's forest + seeded label refinement.

    Splits the frame key exactly like _sgbm_mst_frame_fused (left =
    split[0], right = split[1]) so the staged chain reproduces the fused
    program's RNG stream. `clip_span` mirrors the video refine program's
    clip of the previous frame's maps."""
    from .models.sgbm_mst import _fused_refine_view

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)
    vol = jax.ShapeDtypeStruct((h, w, d), jnp.float32)
    dsp = jax.ShapeDtypeStruct((h, w), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def f(bgr, v, sd, k):
        if clip_span is not None:
            sd = jnp.clip(sd, 0.0, clip_span)
        return _fused_refine_view(
            bgr, v, sd, jax.random.split(k)[view_idx], cfg, h, w,
            tmax, adj_cap, iterations, refine_start, max_neighbors,
        )

    return CompiledPipeline(f, (img, vol, dsp, key))


@dataclass
class _Pending:
    ticket: int
    outputs: Any
    replay: Callable[[], Any] | None = None  # host-side re-execution


class StereoStreamServer:
    """Async double-buffered executor over one compiled frame program.

    `submit()` enqueues the host->device upload and the frame program and
    returns a ticket IMMEDIATELY (XLA dispatch is async); `collect()`
    blocks only on that frame's outputs and returns numpy arrays. With
    `capacity` >= 2 the upload + compute of frame N+1 overlap the compute
    of frame N — the steady-state rate is max(upload, compute), not
    their sum. Submitting beyond `capacity` first collects the oldest
    frame (backpressure), bounding device memory to `capacity` frames.

    Failure recovery (`retries` > 0): TPU workers restart under
    preemption — and this environment's tunneled chip crashes its worker
    on big programs — which surfaces as an exception when a frame's
    outputs are materialized and LOSES every live device buffer. With
    retries enabled the executor keeps a HOST copy of each in-flight
    frame's inputs and, when materialization fails, re-uploads and
    re-runs that frame up to `retries` times (`retry_backoff_s` between
    attempts — set it to the fleet's worker-restart time in real
    deployments; `failures` counts recovered attempts for
    observability). The reference has no failure story at all
    (SURVEY §5: system() return codes checked only to early-return).
    """

    def __init__(
        self,
        pipeline: CompiledPipeline,
        capacity: int = 2,
        retries: int = 0,
        retry_backoff_s: float = 0.0,
    ):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.pipeline = pipeline
        self.capacity = capacity
        self.retries = retries
        self.retry_backoff_s = retry_backoff_s
        self.failures = 0
        self._queue: deque[_Pending] = deque()
        self._next = 0
        self._done: dict[int, Any] = {}

    def submit(
        self,
        *frame_args,
        _pipeline: CompiledPipeline | None = None,
        _replay_args: Sequence[Any] | None = None,
    ) -> int:
        if len(self._queue) >= self.capacity:
            self._finish(self._queue.popleft())
        replay = None
        if self.retries:
            # Host snapshot for replay after device-state loss. When
            # `_replay_args` is given (the video executor: a refine
            # frame's chained device seeds die with the worker), replay
            # routes those args through the PRIMARY pipeline instead.
            src = frame_args if _replay_args is None else _replay_args
            target = (_pipeline or self.pipeline) if _replay_args is None \
                else self.pipeline
            host = tuple(np.asarray(a) for a in src)

            def replay(host=host, target=target):
                return target(*[jax.device_put(jnp.asarray(a)) for a in host])

        try:
            dev = [
                a if isinstance(a, jax.Array)
                else jax.device_put(jnp.asarray(a))
                for a in frame_args
            ]
            out = (_pipeline or self.pipeline)(*dev)
        except Exception:
            # dispatch itself can raise eagerly when an INPUT buffer died
            # with the worker (chained video seeds); recover in place
            if replay is None:
                raise
            self.failures += 1
            out = replay()
        ticket = self._next
        self._next += 1
        self._queue.append(_Pending(ticket, out, replay))
        return ticket

    def _finish(self, p: _Pending) -> None:
        try:
            self._done[p.ticket] = jax.tree_util.tree_map(np.asarray, p.outputs)
            return
        except Exception:
            if not (self.retries and p.replay):
                raise
        import time as _time

        err: Exception | None = None
        for _attempt in range(self.retries):
            self.failures += 1
            if self.retry_backoff_s:  # the worker is restarting right now
                _time.sleep(self.retry_backoff_s)
            try:
                out = p.replay()
                self._done[p.ticket] = jax.tree_util.tree_map(np.asarray, out)
                return
            except Exception as e:  # worker may still be restarting
                err = e
        raise err

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
    retries: int = 0,
    retry_backoff_s: float = 0.0,
    staged: bool = False,
) -> StereoStreamServer:
    """AOT-compile the production north-star pipeline for an HxW stream.

    The frame program is the fused SGBM-seeded 3DMST composition
    (models/sgbm_mst.py::_sgbm_mst_frame_fused) with the on-device
    adgrad+guided cost-volume build in front: BGR pair in, (left, right)
    disparity maps out, one XLA executable, zero per-frame host work.
    Config defaults to `config.production_mst_config` (PARITY.md
    "Production seeded config"). Frames are keyed by submission index so
    the RNG stream is reproducible per frame.

    `staged=True` compiles the SAME composition as a chain of four
    smaller executables (cost volumes / SGBM seeds / per-view refine)
    handed device arrays — identical math and RNG stream, sized for
    workers that cannot execute the monolithic frame program (see
    StagedPipeline). Output parity with the fused server is tested
    (tests/test_serving.py).
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

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    if staged:
        vol_pipe = _staged_vol_pipe(h, w, d)
        seed_pipe = _staged_seed_pipe(h, w, sgbm_cfg, right_seed)
        ref_l, ref_r = (
            _staged_refine_pipe(
                cfg, h, w, d, tmax, adj_cap, fine_iterations,
                refine_start, max_neighbors, i,
            )
            for i in (0, 1)
        )

        def driver(left_bgr, right_bgr, k):
            vl, vr = vol_pipe(left_bgr, right_bgr)
            dl, dr = seed_pipe(left_bgr, right_bgr)
            return (
                ref_l(left_bgr, vl, dl, k),
                ref_r(right_bgr, vr, dr, k),
            )

        pipe: CompiledPipeline | StagedPipeline = StagedPipeline(
            (vol_pipe, seed_pipe, ref_l, ref_r), driver, (img, img, key)
        )
    else:
        def frame(left_bgr, right_bgr, key):
            vl, vr = builtin_cost_volumes(
                left_bgr[..., ::-1], right_bgr[..., ::-1], d
            )
            return _sgbm_mst_frame_fused(
                left_bgr, right_bgr, vl, vr, key, cfg, sgbm_cfg,
                fine_iterations, refine_start, max_neighbors, h, w,
                tmax, adj_cap, right_seed,
            )

        pipe = CompiledPipeline(frame, (img, img, key))
    server = StereoStreamServer(pipe, capacity=capacity, retries=retries,
                                retry_backoff_s=retry_backoff_s)

    def submit_pair(left_bgr, right_bgr, seed: int | None = None):
        s = server._next if seed is None else seed
        return server.submit(left_bgr, right_bgr, jax.random.PRNGKey(s))

    server.submit_pair = submit_pair  # type: ignore[attr-defined]
    return server


class VideoStreamServer(StereoStreamServer):
    """Stateful video executor: frame N's refined disparity maps seed
    frame N+1's plane labels ON DEVICE.

    The seed dependency is a jax.Array future, so chaining frames never
    syncs the host — XLA schedules frame N+1's refine program behind
    frame N's outputs and the async upload/compute overlap of the base
    executor is preserved. Keyframes (frame 0 and, if `reseed_every` is
    set, every `reseed_every` frames SINCE the last keyframe — the
    cadence counter rephases on `reset()`, so a scene cut restarts it)
    run the full SGBM-seeded program (`self.pipeline`); steady-state
    frames run the refine-only program, dropping the whole SGBM stage
    from the per-frame byte budget
    (models/sgbm_mst.py::_mst_refine_frame_fused).

    Seeding semantics (deliberate, GT-sequence-gated): the chained
    temporal state is the RAW dense pre-LR-check map pair straight out of
    the fused frame program — keeping the chain on-device with zero host
    sync. This differs from the offline `sgbm_mst_video` composition,
    which seeds the left view from LR-checked + nearest-valid-filled
    maps; the dense-seeded serving path is gated on the same absolute-GT
    sequence (tests/test_serving.py::
    test_video_server_refine_path_absolute_gt_sequence)."""

    def __init__(
        self,
        keyframe_pipeline: CompiledPipeline,
        refine_pipeline: CompiledPipeline,
        capacity: int = 2,
        reseed_every: int = 0,
        retries: int = 0,
        retry_backoff_s: float = 0.0,
    ):
        super().__init__(keyframe_pipeline, capacity=capacity,
                         retries=retries, retry_backoff_s=retry_backoff_s)
        self.refine_pipeline = refine_pipeline
        self.reseed_every = reseed_every
        self._prev: Any = None
        self._since_key = 0  # frames submitted since last keyframe, incl. it

    def submit_pair(self, left_bgr, right_bgr, seed: int | None = None) -> int:
        i = self._next
        key = jax.random.PRNGKey(i if seed is None else seed)
        keyframe = self._prev is None or (
            self.reseed_every and self._since_key >= self.reseed_every
        )
        if keyframe:
            t = self.submit(left_bgr, right_bgr, key)
            self._since_key = 1
        else:
            # failure replay re-runs this frame as a KEYFRAME: a worker
            # restart loses the chained device seeds, so the honest
            # recovery is to re-key the temporal chain at this frame
            # (keyframes are the highest-quality path; only cost is one
            # SGBM pass)
            t = self.submit(
                left_bgr, right_bgr, *self._prev, key,
                _pipeline=self.refine_pipeline,
                _replay_args=(left_bgr, right_bgr, key),
            )
            self._since_key += 1
        self._prev = self._queue[-1].outputs  # (disp_l, disp_r) device arrays
        return t

    def reset(self) -> None:
        """Drop the temporal state (scene cut): the next frame reseeds
        and the keyframe cadence rephases to it."""
        self._prev = None
        self._since_key = 0


def compile_mst_video_server(
    h: int,
    w: int,
    cfg: MSTConfig | None = None,
    sgbm_cfg: SGBMConfig | None = None,
    fine_iterations: int = 4,
    temporal_iterations: int | None = 2,
    refine_start: float | None = 2.0,
    temporal_refine_start: float | None = 4.0,
    max_neighbors: int = 2,
    right_seed: str = "disp2",
    reseed_every: int = 0,
    capacity: int = 2,
    on_tpu: bool | None = None,
    retries: int = 0,
    retry_backoff_s: float = 0.0,
    staged: bool = False,
) -> VideoStreamServer:
    """AOT-compile the VIDEO serving pair for an HxW stream: the
    SGBM-seeded keyframe program plus the temporal refine-only program
    (previous frame's maps in, refined maps out), both from shape specs
    alone. Steady-state per-frame work = cost-volume build + forest +
    `temporal_iterations` truncated-ladder refinements — no SGBM pass.

    The two programs take SEPARATE ladder entries (ADVICE r3): the
    keyframe keeps `refine_start` (2.0, the single-frame seeded recipe —
    a fresh SGBM seed is only subpixel-wrong) while the refine program
    uses `temporal_refine_start` (default 4.0, the measured video
    recipe: the ladder must cover the expected inter-frame motion in
    pixels — rs=2 at 3 px drift doubled bad2 on the GT sequence).
    temporal_iterations likewise defaults to the measured recipe (2:
    better than 4 on the GT sequence — tests/test_mst_video.py).

    `staged=True` compiles both frame programs as chains of smaller
    executables (see StagedPipeline / compile_sgbm_mst_server): the
    keyframe chain is volumes/seeds/per-view refine; the temporal chain
    is volumes/per-view refine, SHARING the keyframe's volume-build
    executable. Identical math and RNG streams to the fused pair.
    """
    from .config import production_mst_config
    from .models.mst import _fused_capacities
    from .models.sgbm_mst import (
        _default_sgbm_cfg,
        _mst_refine_frame_fused,
        _sgbm_mst_frame_fused,
    )
    from .apps.stereo_yin import builtin_cost_volumes

    if cfg is None:
        if on_tpu is None:
            on_tpu = jax.default_backend() == "tpu"
        cfg = production_mst_config(128, on_tpu=on_tpu, forest_backend="device")
    if sgbm_cfg is None:
        sgbm_cfg = _default_sgbm_cfg(cfg)
    d = cfg.max_disp
    ti = fine_iterations if temporal_iterations is None else temporal_iterations
    trs = refine_start if temporal_refine_start is None else temporal_refine_start
    tmax, adj_cap = _fused_capacities(h, w, cfg)
    span = float(d - 1)

    img = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)
    dsp = jax.ShapeDtypeStruct((h, w), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    if staged:
        vol_pipe = _staged_vol_pipe(h, w, d)
        seed_pipe = _staged_seed_pipe(h, w, sgbm_cfg, right_seed)
        kf_l, kf_r = (
            _staged_refine_pipe(
                cfg, h, w, d, tmax, adj_cap, fine_iterations,
                refine_start, max_neighbors, i,
            )
            for i in (0, 1)
        )
        rf_l, rf_r = (
            _staged_refine_pipe(
                cfg, h, w, d, tmax, adj_cap, ti, trs, max_neighbors, i,
                clip_span=span,
            )
            for i in (0, 1)
        )

        def kf_driver(lb, rb, k):
            vl, vr = vol_pipe(lb, rb)
            dl, dr = seed_pipe(lb, rb)
            return kf_l(lb, vl, dl, k), kf_r(rb, vr, dr, k)

        def rf_driver(lb, rb, pdl, pdr, k):
            vl, vr = vol_pipe(lb, rb)
            return rf_l(lb, vl, pdl, k), rf_r(rb, vr, pdr, k)

        key_pipe: CompiledPipeline | StagedPipeline = StagedPipeline(
            (vol_pipe, seed_pipe, kf_l, kf_r), kf_driver, (img, img, key)
        )
        ref_pipe: CompiledPipeline | StagedPipeline = StagedPipeline(
            (vol_pipe, rf_l, rf_r), rf_driver, (img, img, dsp, dsp, key)
        )
    else:
        def keyframe(left_bgr, right_bgr, key):
            vl, vr = builtin_cost_volumes(
                left_bgr[..., ::-1], right_bgr[..., ::-1], d
            )
            return _sgbm_mst_frame_fused(
                left_bgr, right_bgr, vl, vr, key, cfg, sgbm_cfg,
                fine_iterations, refine_start, max_neighbors, h, w,
                tmax, adj_cap, right_seed,
            )

        def refine(left_bgr, right_bgr, prev_dl, prev_dr, key):
            vl, vr = builtin_cost_volumes(
                left_bgr[..., ::-1], right_bgr[..., ::-1], d
            )
            return _mst_refine_frame_fused(
                left_bgr, right_bgr, vl, vr,
                jnp.clip(prev_dl, 0.0, span), jnp.clip(prev_dr, 0.0, span),
                key, cfg, ti, trs, max_neighbors, h, w, tmax, adj_cap,
            )

        key_pipe = CompiledPipeline(keyframe, (img, img, key))
        ref_pipe = CompiledPipeline(refine, (img, img, dsp, dsp, key))
    return VideoStreamServer(
        key_pipe, ref_pipe, capacity=capacity, reseed_every=reseed_every,
        retries=retries, retry_backoff_s=retry_backoff_s,
    )
