"""Bisect the fused full-size tunnel-worker crash (VERDICT r4 #5).

Round 3 ran bare 3DMST at 1280x960x128 through the tunnel (20.4 s/iter);
the round-4 FUSED composition (SGBM seed + volume build + device forest
+ refine as ONE program) kills the tunnel worker at full size while
640x480 runs. This sweep walks the size ladder with one SUBPROCESS per
(size, variant) so a worker crash is recorded and the next probe starts
on a restarted worker. Variants discriminate the two suspects at the
first failing size:

  full    — the whole fused frame program (volume build in-program)
  novol   — fused frame fed PRE-BUILT volumes (volume build excluded):
            isolates "program size/arity" from "in-program volume build"
  xla     — full, scan_backend=xla (pallas excluded)

Writes one JSON line per probe to stdout and a summary to
docs/dev/fused_crash_bisect.json. Run on the tunneled chip:

    python docs/dev/fused_crash_bisect.py [--budget 2400]
"""

import json
import os
import subprocess
import sys
import time

SIZES = [(480, 640), (672, 896), (816, 1088), (960, 1280)]

PROBE = r"""
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
h, w, variant = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from stereomatch_tpu.config import production_mst_config
from stereomatch_tpu.models.mst import _fused_capacities
from stereomatch_tpu.models.sgbm_mst import (
    _default_sgbm_cfg, _sgbm_mst_frame_fused)
from stereomatch_tpu.apps.stereo_yin import builtin_cost_volumes
d = 128
rng = np.random.default_rng(0)
img_l = (rng.random((h, w, 3)) * 255).astype(np.float32)
for _ in range(3):
    img_l = (img_l + np.roll(img_l, 1, 0) + np.roll(img_l, 1, 1)) / 3
img_r = np.roll(img_l, -7, axis=1)
bl, br = jnp.asarray(img_l), jnp.asarray(img_r)
jax.block_until_ready(br)
cfg = production_mst_config(d, on_tpu=(variant != "xla"),
                            forest_backend="device")
scfg = _default_sgbm_cfg(cfg)
tmax, adj_cap = _fused_capacities(h, w, cfg)

if variant == "novol":
    vl, vr = jax.jit(lambda a, b: builtin_cost_volumes(
        a[..., ::-1], b[..., ::-1], d))(bl, br)
    jax.block_until_ready(vr)

    @jax.jit
    def frame(bl, br, vl, vr, key):
        return _sgbm_mst_frame_fused(
            bl, br, vl, vr, key, cfg, scfg, 4, 2.0, 2, h, w, tmax,
            adj_cap, "disp2")

    args = (bl, br, vl, vr, jax.random.PRNGKey(0))
else:
    @jax.jit
    def frame(bl, br, key):
        vl, vr = builtin_cost_volumes(bl[..., ::-1], br[..., ::-1], d)
        return _sgbm_mst_frame_fused(
            bl, br, vl, vr, key, cfg, scfg, 4, 2.0, 2, h, w, tmax,
            adj_cap, "disp2")

    args = (bl, br, jax.random.PRNGKey(0))

t0 = time.time()
lowered = frame.lower(*args)
compiled = lowered.compile()
t1 = time.time()
print(json.dumps({"phase": "compiled", "compile_s": round(t1 - t0, 1)}),
      flush=True)
dl, dr = compiled(*args)
float(jnp.sum(dl) + jnp.sum(dr))
t2 = time.time()
print(json.dumps({"phase": "ran", "compile_s": round(t1 - t0, 1),
                  "first_run_s": round(t2 - t1, 1)}), flush=True)
"""


def main():
    budget = 2400.0
    if "--budget" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
    t_start = time.time()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/stereomatch_jax_cache_tpu")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                          "0.0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    results = {}
    first_fail = None
    for h, w in SIZES:
        variants = ["full"] if first_fail is None else \
            ["full", "novol", "xla"]
        for variant in variants:
            left = budget - (time.time() - t_start)
            if left < 300:
                print(f"budget exhausted before {w}x{h}/{variant}",
                      file=sys.stderr)
                break
            tag = f"{w}x{h}/{variant}"
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", PROBE, str(h), str(w), variant],
                    capture_output=True, text=True,
                    timeout=min(900, left - 30),
                )
                last = None
                for line in reversed(r.stdout.strip().splitlines()):
                    try:
                        last = json.loads(line)
                        break
                    except ValueError:
                        continue
                ent = {"rc": r.returncode,
                       "wall_s": round(time.time() - t0, 1)}
                if last:
                    ent.update(last)
                if r.returncode != 0:
                    ent["stderr_tail"] = r.stderr.strip()[-300:]
            except subprocess.TimeoutExpired:
                ent = {"rc": "timeout",
                       "wall_s": round(time.time() - t0, 1)}
            results[tag] = ent
            print(json.dumps({tag: ent}), flush=True)
            ok = ent.get("phase") == "ran" and ent.get("rc") == 0
            if variant == "full" and not ok and first_fail is None:
                first_fail = (h, w)
            time.sleep(20)  # let a crashed worker restart
        else:
            continue
        break
    out = {"sizes": results, "first_full_failure": first_fail,
           "note": "one subprocess per probe; compile and first-run "
                   "phases reported separately so 'compiles but crashes "
                   "executing' is distinguishable from 'remote compiler "
                   "rejects'"}
    with open(os.path.join(os.path.dirname(__file__),
                           "fused_crash_bisect.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
