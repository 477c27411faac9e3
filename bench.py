"""Benchmark harness — prints ONE JSON line per driver contract.

Headline metric (BASELINE.md north star): end-to-end frames/s at
1280x960, 128 disparities, on the available chip. Round 1 benches the
SGBM engine (the reference's namesake algorithm, numDisparities=128,
MODE_HH 8-path) end to end: prefilter -> BT cost -> 8-path aggregation ->
WTA/uniqueness/subpixel/disp12. vs_baseline is fps / 30 (the driver-set
>=30 fps target, BASELINE.json).

Extra per-stage timings go to stderr (the reference's stage prints,
src/PatchMatchStereoGPU.cu:8963-9215, reimagined).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stereomatch_tpu.config import SGBMConfig
    from stereomatch_tpu.ops.sgbm import sgbm_disparity

    h, w, d = 960, 1280, 128
    rng = np.random.default_rng(0)
    # realistic input: textured scene with a disparity step
    tex = rng.random((h, w + d)).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 0)) / 3
    tex = tex * 255
    left = jnp.asarray(tex[:, : w])
    right = jnp.asarray(tex[:, 40 : 40 + w])

    cfg = SGBMConfig(min_disp=0, num_disp=d, block_size=5)

    @jax.jit
    def step(l, r):
        out = sgbm_disparity(l, r, cfg)
        # scalar summary: forces the whole pipeline but keeps the host
        # transfer negligible (block_until_ready is unreliable and full-map
        # transfers cost ~100s of ms through tunneled device backends)
        return jnp.sum(out.disparity)

    print("compiling...", file=sys.stderr)
    t0 = time.time()
    float(step(left, right))
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    float(step(left, right))
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        float(step(left, right))
    dt = (time.time() - t0) / iters
    fps = 1.0 / dt
    print(f"sgbm 1280x960x128: {dt * 1e3:.1f} ms/frame", file=sys.stderr)

    # secondary engine timings (stderr only; smaller config to bound
    # compile time on the tunneled chip)
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
        t0 = time.time()
        for _ in range(3):
            float(cv_step(lb, rb))
        print(
            f"costvolume+guided+denoise 1280x960x128 (both views): "
            f"{(time.time() - t0) / 3 * 1e3:.1f} ms/frame",
            file=sys.stderr,
        )
    except Exception as e:  # secondary metrics must never break the bench
        print(f"secondary bench skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "sgbm_fps_1280x960x128",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
