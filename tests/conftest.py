"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is tested the standard JAX way — with
XLA_FLAGS=--xla_force_host_platform_device_count (see SURVEY.md §4) — so no
TPU pod is needed to exercise pjit/shard_map paths.
"""

import os
import sys

# Force CPU: the driver environment presets JAX_PLATFORMS=axon (one real
# TPU chip), but the suite needs the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin IGNORES the env var (CLAUDE.md) — without this
# config-level pin, every unplaced array lands on the tunneled chip and the
# suite inherits its slow remote compiles and occasional worker flakes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (machine-local, /tmp): round 4's box has ONE
# CPU core, so XLA:CPU compiles dominate the suite (~30 min of mostly
# compile time) — and its backend_compile segfaults deterministically deep
# into a cold single-process run (see _clear_jax_caches_between_modules).
# A warm cache both cuts reruns to a fraction and routes most programs
# through deserialization instead of the crashing compile path.
jax.config.update("jax_compilation_cache_dir", "/tmp/stereomatch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables when a module finishes.

    Round 4's 1-CPU box segfaults XLA:CPU's backend_compile
    DETERMINISTICALLY ~112 tests into a single-process full-suite run
    (both the driver's run and a local rerun died at the same test;
    the test passes alone) — a compile-state accumulation bug in the
    backend, not in this code. Modules share almost no jitted programs,
    so dropping the caches between modules costs little and keeps the
    per-process accumulation far from the crash threshold."""
    yield
    import gc

    import jax as _jax

    _jax.clear_caches()
    gc.collect()  # drop executables still held via module-level jits


@pytest.fixture()
def rng():
    """Function-scoped: every test gets the SAME fresh stream, so inputs
    do not depend on which other tests ran first (a session-scoped shared
    generator made one banded-SGBM near-tie input appear only in full-suite
    order and nowhere else)."""
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def flir_pair():
    """One bundled FLIR stereo pair at reduced resolution (fast tests)."""
    from stereomatch_tpu.io import load_image

    left = load_image(f"{REFERENCE}/build/000020_191400042.jpg")
    right = load_image(f"{REFERENCE}/build/000020_191400039.jpg")
    # downsample 4x for test speed
    return left[::4, ::4], right[::4, ::4]


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)
