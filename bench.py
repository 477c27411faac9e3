"""Benchmark harness — prints ONE JSON line per driver contract.

Headline metric (BASELINE.md north star): end-to-end frames/s at
1280x960, 128 disparities, on the available chip (SGBM, the reference's
namesake: prefilter -> BT cost -> 8-path aggregation -> WTA/uniqueness/
subpixel/disp12). vs_baseline is fps / 30 (driver-set target).

The perf story is made MEASURABLE (VERDICT round-1 #3):
  - analytic bytes-touched-per-frame and volume passes per engine, the
    achieved GB/s they imply, and a roofline projection to real v5e HBM
    bandwidth (819 GB/s) — because the tunneled bench chip moves ~6-19
    GB/s (CLAUDE.md), absolute local ms is environmental;
  - a bf16-cost SGBM number and a banded 2048x1536x256 number;
  - a subprocess try-compile-with-timeout of the Pallas SGBM backend and
    of 3DMST at 1280x960x128, recording ok/hang + ms instead of silently
    skipping (the tunnel's remote compiler has hung on both).

Per-stage timings go to stderr (the reference's stage prints,
src/PatchMatchStereoGPU.cu:8963-9215, reimagined); the JSON line carries
the headline plus an "extra" dict with every secondary number.
"""

import json
import subprocess
import sys
import time

import numpy as np

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth, jax-ml.github.io/scaling-book


def _time_stepfn(step, args, iters, warmup=2):
    for _ in range(warmup):
        float(step(*args))
    t0 = time.time()
    for _ in range(iters):
        float(step(*args))
    return (time.time() - t0) / iters


def _subprocess_probe(tag, code, timeout, extra, env=None):
    """Run `code` in a child python with a timeout; record ok/hang + ms."""
    import os

    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
            env={**os.environ, **(env or {})},
        )
        ms = (time.time() - t0) * 1e3
        val = None
        if r.returncode == 0 and r.stdout.strip():
            try:
                val = json.loads(r.stdout.strip().splitlines()[-1])
            except ValueError:
                val = None  # stray non-JSON stdout must not kill the bench
            if not isinstance(val, dict):
                val = None  # a JSON scalar/list would crash the dict splat
        if val is not None:
            extra[tag] = {"status": "ok", **val}
            print(f"{tag}: ok {val}", file=sys.stderr)
        else:
            extra[tag] = {"status": "error", "ms": round(ms, 1)}
            print(f"{tag}: error\n{r.stderr[-800:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        extra[tag] = {"status": "hang", "timeout_s": timeout}
        print(f"{tag}: HANG (>{timeout}s)", file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    from stereomatch_tpu.config import SGBMConfig, replace
    from stereomatch_tpu.ops.sgbm import sgbm_disparity

    h, w, d = 960, 1280, 128
    rng = np.random.default_rng(0)
    tex = rng.random((h, w + d)).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 0)) / 3
    tex = tex * 255
    left = jnp.asarray(tex[:, :w])
    right = jnp.asarray(tex[:, 40 : 40 + w])

    cfg = SGBMConfig(min_disp=0, num_disp=d, block_size=5)
    extra = {}

    @jax.jit
    def step(l, r):
        out = sgbm_disparity(l, r, cfg)
        # scalar summary: forces the whole pipeline but keeps the host
        # transfer negligible (block_until_ready is unreliable through the
        # tunnel, CLAUDE.md)
        return jnp.sum(out.disparity)

    print("compiling sgbm f32...", file=sys.stderr)
    t0 = time.time()
    float(step(left, right))
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)
    dt = _time_stepfn(step, (left, right), 5)
    fps = 1.0 / dt
    print(f"sgbm 1280x960x128: {dt * 1e3:.1f} ms/frame", file=sys.stderr)

    # ---- analytic roofline (volume = H*W*D elements; passes = full
    # read-or-write traversals of a volume-sized array in the program:
    # cost build 1W + block-sum cumsums ~4 + row scans down/up (2x R+W,
    # flip-free via reverse scans) + E/W (1 transpose each way + 2 scans
    # sharing the read ~4) + selection reductions (~2R) ~= 13 volume
    # passes f32) ----
    passes = 13
    vol_bytes = h * w * d * 4
    bytes_frame = passes * vol_bytes
    gbps = bytes_frame / dt / 1e9
    v5e_fps = V5E_HBM_GBPS * 1e9 / bytes_frame
    extra["sgbm_f32"] = {
        "ms": round(dt * 1e3, 1),
        "passes": passes,
        "gb_per_frame": round(bytes_frame / 1e9, 3),
        "achieved_gbps": round(gbps, 2),
        "v5e_roofline_fps": round(v5e_fps, 1),
    }
    print(
        f"  analytic: {bytes_frame/1e9:.2f} GB/frame ({passes} volume "
        f"passes) -> achieved {gbps:.1f} GB/s; v5e roofline {v5e_fps:.0f} fps",
        file=sys.stderr,
    )

    # ---- bf16 SGBM ----
    try:
        cfg16 = replace(cfg, cost_dtype="bfloat16")

        @jax.jit
        def step16(l, r):
            return jnp.sum(sgbm_disparity(l, r, cfg16).disparity)

        float(step16(left, right))
        dt16 = _time_stepfn(step16, (left, right), 5)
        b16 = passes * h * w * d * 2
        extra["sgbm_bf16"] = {
            "ms": round(dt16 * 1e3, 1),
            "gb_per_frame": round(b16 / 1e9, 3),
            "achieved_gbps": round(b16 / dt16 / 1e9, 2),
            "v5e_roofline_fps": round(V5E_HBM_GBPS * 1e9 / b16, 1),
        }
        print(f"sgbm bf16: {dt16*1e3:.1f} ms/frame", file=sys.stderr)
    except Exception as e:
        print(f"bf16 bench skipped: {e}", file=sys.stderr)

    # ---- banded SGBM at the reference's NATIVE scale (2048x1536x256) ----
    try:
        from stereomatch_tpu.ops.sgbm import sgbm_disparity_banded

        h2, w2, d2 = 1536, 2048, 256
        tex2 = np.tile(tex, (2, 2))[:h2, : w2 + 64]
        l2 = jnp.asarray(tex2[:, :w2])
        r2 = jnp.asarray(tex2[:, 64 : 64 + w2])
        cfg2k = SGBMConfig(min_disp=0, num_disp=d2, block_size=5,
                           cost_dtype="bfloat16")

        @jax.jit
        def step2k(l, r):
            return jnp.sum(sgbm_disparity_banded(l, r, cfg2k, 128).disparity)

        print("compiling banded 2048x1536x256...", file=sys.stderr)
        float(step2k(l2, r2))
        dt2k = _time_stepfn(step2k, (l2, r2), 2, warmup=1)
        b2k = passes * h2 * w2 * d2 * 2 * 1.5  # up-sweep re-runs band costs
        extra["sgbm_banded_2048x1536x256_bf16"] = {
            "ms": round(dt2k * 1e3, 1),
            "fps": round(1.0 / dt2k, 2),
            "v5e_roofline_fps": round(V5E_HBM_GBPS * 1e9 / b2k, 1),
        }
        print(f"banded 2048x1536x256 bf16: {dt2k*1e3:.1f} ms/frame", file=sys.stderr)
    except Exception as e:
        print(f"banded bench skipped: {e}", file=sys.stderr)

    # ---- cost-volume pipeline (both views) ----
    try:
        from stereomatch_tpu.config import (
            CostVolumeConfig,
            CostVolumePipelineConfig,
            GuidedFilterConfig,
        )
        from stereomatch_tpu.models import cost_volume_stereo

        cfg2 = CostVolumePipelineConfig(
            volume=CostVolumeConfig(min_disp=0, max_disp=127),
            guided=GuidedFilterConfig(slab=16),
        )
        lb = jnp.stack([left] * 3, axis=-1)
        rb = jnp.stack([right] * 3, axis=-1)

        @jax.jit
        def cv_step(l, r):
            out = cost_volume_stereo(l, r, cfg2)
            return jnp.sum(out.left_disp) + jnp.sum(out.right_disp)

        float(cv_step(lb, rb))
        dtc = _time_stepfn(cv_step, (lb, rb), 3, warmup=1)
        # per view: cost 1W + guided filter ~8 (4 box-filter RW pairs on
        # p/corr/a/b) + WTA ~2R = ~11 passes; x2 views
        cpasses = 22
        cb = cpasses * h * w * d * 4
        extra["costvolume_pipeline"] = {
            "ms": round(dtc * 1e3, 1),
            "passes": cpasses,
            "achieved_gbps": round(cb / dtc / 1e9, 2),
            "v5e_roofline_fps": round(V5E_HBM_GBPS * 1e9 / cb, 1),
        }
        print(f"costvolume both views: {dtc*1e3:.1f} ms/frame", file=sys.stderr)
    except Exception as e:
        print(f"costvolume bench skipped: {e}", file=sys.stderr)

    # ---- remaining engines: BM + census at headline size ----
    try:
        from stereomatch_tpu.config import BMConfig, CensusConfig
        from stereomatch_tpu.ops.bm import bm_disparity
        from stereomatch_tpu.ops.cost import census_stereo

        bcfg = BMConfig(num_disp=d, block_size=9)

        @jax.jit
        def bm_step(l, r):
            return jnp.sum(bm_disparity(l, r, bcfg).disparity)

        float(bm_step(left, right))
        dtb = _time_stepfn(bm_step, (left, right), 3, warmup=1)
        extra["bm"] = {"ms": round(dtb * 1e3, 1)}
        print(f"bm 1280x960x128: {dtb*1e3:.1f} ms/frame", file=sys.stderr)

        ccfg = CensusConfig(d_max=50)
        l01 = left * (1.0 / 255.0)
        r01 = right * (1.0 / 255.0)

        @jax.jit
        def census_step(l, r):
            return jnp.sum(census_stereo(l, r, ccfg))

        float(census_step(l01, r01))
        dtc2 = _time_stepfn(census_step, (l01, r01), 3, warmup=1)
        extra["census"] = {"ms": round(dtc2 * 1e3, 1)}
        print(f"census 1280x960x51: {dtc2*1e3:.1f} ms/frame", file=sys.stderr)
    except Exception as e:
        print(f"bm/census bench skipped: {e}", file=sys.stderr)

    # ---- PatchMatch: subprocess probe (window-cost engine; bounded).
    # The tunnel worker CRASHES on this program above ~384x288 (recorded
    # honestly below; isolated in a subprocess so the bench survives) ----
    pm_code = r"""
import time, json
import numpy as np, jax, jax.numpy as jnp
from stereomatch_tpu.config import PatchMatchConfig
from stereomatch_tpu.ops.patchmatch import patchmatch_stereo
h, w = 288, 384
rng = np.random.default_rng(0)
tex = (rng.random((h, w + 64, 3)) * 255).astype(np.float32)
left = jnp.asarray(tex[:, :w]); right = jnp.asarray(tex[:, 40:40+w])
cfg = PatchMatchConfig(max_disp=60.0, iterations=10, tap_stride=5)
t0 = time.time()
l, r, cl, cr = patchmatch_stereo(jax.random.PRNGKey(0), left, right, cfg)
np.asarray(l.d[0, :4]); t1 = time.time()
l, r, cl, cr = patchmatch_stereo(jax.random.PRNGKey(1), left, right, cfg)
np.asarray(l.d[0, :4]); t2 = time.time()
print(json.dumps({"compile_s": round(t1 - t0, 1),
                  "ms_10iter_384x288": round((t2 - t1) * 1e3, 1)}))
"""
    _subprocess_probe("patchmatch_384x288", pm_code, 900, extra)

    # ---- host forest builder at native scale (VERDICT weak #4) ----
    try:
        from stereomatch_tpu.native import build_forest

        h3, w3 = 1536, 2048
        img3 = (np.tile(tex, (2, 2))[:h3, :w3]).astype(np.float32)
        wr3 = np.abs(img3[:, 1:] - img3[:, :-1])
        wd3 = np.abs(img3[1:] - img3[:-1])
        t0 = time.time()
        f3 = build_forest(wr3, wd3, 5000.0, 200, 1 / 12.0, 4.0)
        tb = time.time() - t0
        extra["treebuild_2048x1536"] = {
            "ms": round(tb * 1e3, 1), "trees": f3.num_trees,
        }
        print(f"treebuild 2048x1536: {tb*1e3:.0f} ms, {f3.num_trees} trees",
              file=sys.stderr)
    except Exception as e:
        print(f"treebuild bench skipped: {e}", file=sys.stderr)

    # ---- 3DMST at 1280x960x128: subprocess with timeout (the tunnel's
    # remote compiler has hung on volume-scale MST; record it) ----
    mst_code = r"""
import time, json
import numpy as np, jax, jax.numpy as jnp
from stereomatch_tpu.native import build_forest, color_edge_weights
from stereomatch_tpu.ops.mst import forest_arrays, mst_pms_optimize
from stereomatch_tpu.config import MSTConfig
h, w, d = 960, 1280, 128
rng = np.random.default_rng(0)
img = (rng.random((h, w, 3)) * 255).astype(np.float32)
for _ in range(3):
    img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3
wr, wd = color_edge_weights(img)
f = build_forest(wr, wd, 5000.0, 200, 1/12.0, 4.0)
fa = forest_arrays(f)
vol = (rng.random((h, w, d)) * 0.5).astype(np.float32)
cfg = MSTConfig(max_disp=d)
t0 = time.time()
a, b, c, mc = mst_pms_optimize(jax.random.PRNGKey(0), jnp.asarray(vol), fa,
                               cfg, max_neighbors=4, iterations=1,
                               candidate_chunk=4)
np.asarray(mc)
t1 = time.time()
# steady-state: re-run the ALREADY-COMPILED 1-iteration program (a
# 2-iteration call would retrace — iterations is a static jit arg — and
# fold a second compile into the measurement)
a, b, c, mc = mst_pms_optimize(jax.random.PRNGKey(1), jnp.asarray(vol), fa,
                               cfg, max_neighbors=4, iterations=1,
                               candidate_chunk=4)
np.asarray(mc)
t2 = time.time()
# analytic bytes/iteration: K candidates x (carry_iters+1)*2 Euler-prefix
# passes, each ~10 blocked-scan levels over 2N f32 events read+write, plus
# ~6 N-sized gather/scatters per pass (in/out_pos, parents, label_cost)
K = 4 + 9
n2 = 2 * h * w
passes = (cfg.carry_iters + 1) * 2
gb_iter = K * passes * (10 * n2 * 4 * 2 + 6 * h * w * 4) / 1e9
dt = (t2 - t1)
print(json.dumps({"compile_s": round(t1 - t0, 1),
                  "ms_per_iteration": round(dt * 1e3, 1),
                  "analytic_gb_per_iteration": round(gb_iter, 1),
                  "achieved_gbps": round(gb_iter / dt, 2),
                  "v5e_roofline_s_per_iteration": round(gb_iter / 819.0, 2)}))
"""
    _subprocess_probe("mst_1280x960x128", mst_code, 1500, extra)

    # ---- Pallas SGBM backend: try-compile with timeout, small then
    # near-full size (960x1152; the tunnel's remote compiler handles
    # <=512-row shapes but has returned HTTP 500 above — record whatever
    # happens) ----
    pallas_code = r"""
import time, json, re
import numpy as np, jax, jax.numpy as jnp
from stereomatch_tpu.ops.sgbm_pallas import aggregate_8path_pallas
out = {}
for tag, (h, w, d) in (("small_128x256x128", (128, 256, 128)),
                       ("full_960x1152x128", (960, 1152, 128))):
    c = jnp.asarray(np.random.default_rng(0).random((h, w, d), np.float32))
    t0 = time.time()
    try:
        s = jax.jit(lambda c: aggregate_8path_pallas(c, 24.0, 96.0, 8))(c)
        np.asarray(s[0, 0, :4])
        out[tag] = {"status": "ok", "compile_and_run_s": round(time.time() - t0, 1)}
    except Exception as e:
        msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e)).splitlines()[0]
        out[tag] = {"status": "error", "error": msg[:120]}
print(json.dumps(out))
"""
    _subprocess_probe("pallas_sgbm", pallas_code, 600, extra)

    print(
        json.dumps(
            {
                "metric": "sgbm_fps_1280x960x128",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
