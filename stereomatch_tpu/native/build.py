"""Build the native host-side library: `python -m stereomatch_tpu.native.build`.

Compiles treebuild.cpp into libsmtpu_native.so next to this file. Safe to
re-run; skips compilation when the .so is newer than all sources.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = ["treebuild.cpp"]
LIB = os.path.join(HERE, "libsmtpu_native.so")


def build(force: bool = False, verbose: bool = True) -> str:
    srcs = [os.path.join(HERE, s) for s in SOURCES]
    if (
        not force
        and os.path.exists(LIB)
        and all(os.path.getmtime(LIB) >= os.path.getmtime(s) for s in srcs)
    ):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        LIB,
        *srcs,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(LIB)
