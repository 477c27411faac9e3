"""utils/timing.py: the replacement for the reference's timer family
(startTimer/getTimer src/Stereo3DMST.cpp:15-26, StartTimer/GetTimer +
cudaEvent timers + timingStat src/PatchMatchStereoGPU.cu:9479-9535) and
the structured jax.profiler trace hook that replaces its ad-hoc stage
prints."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from stereomatch_tpu.utils import StageTimer, profile_trace, timing_stat


def test_timing_stat_mean_std():
    mean, std = timing_stat([2.0, 4.0, 6.0])
    assert mean == pytest.approx(4.0)
    assert std == pytest.approx(np.std([2.0, 4.0, 6.0]))
    assert timing_stat([]) == (0.0, 0.0)


def test_stage_timer_accumulates_and_reports():
    t = StageTimer()
    x = jnp.ones((8, 8))
    with t.stage("a", result=x):
        y = x + 1
    out = t.time("b", lambda v: v * 2, y)
    assert np.asarray(out).max() == 4.0
    assert set(t.stages) == {"a", "b"}
    rep = t.report()
    assert "a:" in rep and "b:" in rep and "ms" in rep


def test_profile_trace_writes_a_trace(tmp_path):
    """profile_trace produces an on-disk xplane trace for the wrapped
    region (viewable in TensorBoard/xprof) — the structured profiler the
    reference lacks (SURVEY §5)."""
    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        jnp.sum(jnp.ones((64, 64)) * 2.0).block_until_ready()
    found = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert found, f"no xplane trace written under {logdir}"
