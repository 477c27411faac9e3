"""Checkpoint / resume for long-running optimizers.

The reference has NO checkpointing (SURVEY.md §5): its only persistent
intermediate state is image files and the mc-cnn left.bin/right.bin cost
volumes (which io/costvolume.py reads/writes). This module adds the real
thing for the iterative engines: snapshot the MST plane-label state or
PatchMatch plane state to a single .npz and resume optimization from it —
e.g. run 50 MST_PMS iterations, checkpoint, resume 50 more later.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(path: str, **arrays) -> None:
    """Save named arrays (jax or numpy) to one .npz checkpoint."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_state(path: str) -> dict:
    """Load a checkpoint into a dict of numpy arrays."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
