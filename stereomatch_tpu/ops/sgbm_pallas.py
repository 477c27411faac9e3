"""Pallas TPU kernels for SGBM path aggregation.

The XLA `lax.scan` formulation (ops/sgbm.py::aggregate_8path) re-reads and
re-writes its carry from HBM every step and materializes one partial volume
per scan. These kernels keep the DP carry (the Lr state of up to three
directions) resident in VMEM scratch across a sequential grid, stream one
row (or column) block of the cost volume per step, and ACCUMULATE into the
output volume in place (input/output aliasing) — the aggregation becomes
4 kernels x (read C + read/write S) = the memory-traffic lower bound for
an 8-path SGBM that keeps S.

Recurrence per direction (identical to aggregate_8path):
    Lr(p,d) = C(p,d) + min(Lr(q,d), Lr(q,d-1)+P1, Lr(q,d+1)+P1,
                           minLr(q)+P2) - minLr(q)
with zero state at image borders. Diagonal directions are the row
recurrence with the carry shifted one column.

`aggregate_8path_pallas` matches `aggregate_8path` exactly (tested in
interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["aggregate_8path_pallas"]

_BIG = 1e9  # python float: becomes a compile-time constant inside kernels


def _dp_step(c, lp, p1, p2):
    """One DP update: c, lp are (..., D)."""
    mp = jnp.min(lp, axis=-1, keepdims=True)
    up = jnp.concatenate([jnp.full_like(lp[..., :1], _BIG), lp[..., :-1]], axis=-1)
    dn = jnp.concatenate([lp[..., 1:], jnp.full_like(lp[..., :1], _BIG)], axis=-1)
    cand = jnp.minimum(jnp.minimum(lp, up + p1), jnp.minimum(dn + p1, mp + p2))
    return c + cand - mp


def _row_kernel(ndir, p1, p2, c_ref, s_in_ref, s_out_ref, carry):
    """Grid over rows; carry (ndir, W, D) persists in VMEM. Directions:
    0 = vertical, 1 = diagonal from the left (predecessor col-1),
    2 = diagonal from the right."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    c = c_ref[0]  # (W, D)
    w = c.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    total = s_in_ref[0]
    for k in range(ndir):
        lp = carry[k]
        if k == 1:  # predecessor one column left: shift down along W, zero row 0
            lp = jnp.where(col == 0, 0.0, pltpu.roll(lp, 1, axis=0))
        elif k == 2:  # predecessor one column right (roll by w-1 == -1)
            lp = jnp.where(col == w - 1, 0.0, pltpu.roll(lp, w - 1, axis=0))
        l = _dp_step(c, lp, p1, p2)
        carry[k] = l
        total = total + l
    s_out_ref[0] = total


def _col_kernel(p1, p2, cb, reverse, c_ref, s_in_ref, s_out_ref, carry):
    """Grid over column blocks of `cb`; carry (H, D) in VMEM; the block's
    columns are processed sequentially inside (keeps the last-two block
    dims at (cb >= 8, D) to satisfy TPU tiling)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    order = range(cb - 1, -1, -1) if reverse else range(cb)
    for k in order:
        c = c_ref[:, k]  # (H, D)
        l = _dp_step(c, carry[...], p1, p2)
        carry[...] = l
        s_out_ref[:, k] = s_in_ref[:, k] + l


def _row_kernel_carry(
    ndir, p1, p2, rows, c_ref, s_in_ref, cin_ref, s_out_ref, cout_ref, carry
):
    """_row_kernel with the VMEM carry seeded from / drained to explicit
    (ndir, W, D) operands, so a tall frame can be aggregated as a sequence
    of short pallas_calls (the tunnel's remote compiler 500s on >512-row
    single-call programs; the carry hand-off makes chunking exact)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = cin_ref[...]

    c = c_ref[0]
    w = c.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
    total = s_in_ref[0]
    for k in range(ndir):
        lp = carry[k]
        if k == 1:
            lp = jnp.where(col == 0, 0.0, pltpu.roll(lp, 1, axis=0))
        elif k == 2:
            lp = jnp.where(col == w - 1, 0.0, pltpu.roll(lp, w - 1, axis=0))
        l = _dp_step(c, lp, p1, p2)
        carry[k] = l
        total = total + l
    s_out_ref[0] = total

    @pl.when(i == rows - 1)
    def _():
        cout_ref[...] = carry[...]


def _row_chunk_call(cblk, sblk, carry, p1, p2, ndir, reverse, interpret):
    rows, w, d = cblk.shape
    idx = (lambda i: (rows - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    cspec = pl.BlockSpec((ndir, w, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_row_kernel_carry, ndir, p1, p2, rows),
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM),
            cspec,
        ],
        out_specs=[pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM), cspec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, w, d), cblk.dtype),
            jax.ShapeDtypeStruct((ndir, w, d), cblk.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((ndir, w, d), cblk.dtype)],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(cblk, sblk, carry)


def _row_pass(cost, s, p1, p2, ndir, reverse, interpret, chunk=None):
    h, w, d = cost.shape
    if chunk is not None and chunk < h:
        carry = jnp.zeros((ndir, w, d), cost.dtype)
        starts = list(range(0, h, chunk))
        for r0 in reversed(starts) if reverse else starts:
            rows = min(chunk, h - r0)
            cblk = jax.lax.slice_in_dim(cost, r0, r0 + rows, axis=0)
            sblk = jax.lax.slice_in_dim(s, r0, r0 + rows, axis=0)
            sblk, carry = _row_chunk_call(
                cblk, sblk, carry, p1, p2, ndir, reverse, interpret
            )
            s = jax.lax.dynamic_update_slice_in_dim(s, sblk, r0, 0)
        return s
    idx = (lambda i: (h - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_row_kernel, ndir, p1, p2),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, d), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, d), cost.dtype),
        scratch_shapes=[pltpu.VMEM((ndir, w, d), cost.dtype)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost, s)


def _col_kernel_carry(
    p1, p2, cb, reverse, nblocks, c_ref, s_in_ref, cin_ref, s_out_ref, cout_ref,
    carry,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        carry[...] = cin_ref[...]

    order = range(cb - 1, -1, -1) if reverse else range(cb)
    for k in order:
        c = c_ref[:, k]
        l = _dp_step(c, carry[...], p1, p2)
        carry[...] = l
        s_out_ref[:, k] = s_in_ref[:, k] + l

    @pl.when(j == nblocks - 1)
    def _():
        cout_ref[...] = carry[...]


def _col_chunk_call(cblk, sblk, carry, p1, p2, reverse, interpret, cb):
    h, wblk, d = cblk.shape
    nb = wblk // cb
    idx = (lambda j: (0, nb - 1 - j, 0)) if reverse else (lambda j: (0, j, 0))
    cspec = pl.BlockSpec((h, d), lambda j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_col_kernel_carry, p1, p2, cb, reverse, nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM),
            cspec,
        ],
        out_specs=[pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM), cspec],
        out_shape=[
            jax.ShapeDtypeStruct((h, wblk, d), cblk.dtype),
            jax.ShapeDtypeStruct((h, d), cblk.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((h, d), cblk.dtype)],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(cblk, sblk, carry)


def _col_pass(cost, s, p1, p2, reverse, interpret, cb=8, chunk=None):
    h, w, d = cost.shape
    assert w % cb == 0, (w, cb)
    nb = w // cb
    if chunk is not None and chunk < w:
        chunk = (chunk // cb) * cb
        assert chunk >= cb, (chunk, cb)
        carry = jnp.zeros((h, d), cost.dtype)
        starts = list(range(0, w, chunk))
        for c0 in reversed(starts) if reverse else starts:
            cols = min(chunk, w - c0)
            cblk = jax.lax.slice_in_dim(cost, c0, c0 + cols, axis=1)
            sblk = jax.lax.slice_in_dim(s, c0, c0 + cols, axis=1)
            sblk, carry = _col_chunk_call(
                cblk, sblk, carry, p1, p2, reverse, interpret, cb
            )
            s = jax.lax.dynamic_update_slice_in_dim(s, sblk, c0, 1)
        return s
    idx = (lambda j: (0, nb - 1 - j, 0)) if reverse else (lambda j: (0, j, 0))
    return pl.pallas_call(
        functools.partial(_col_kernel, p1, p2, cb, reverse),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, cb, d), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, d), cost.dtype),
        scratch_shapes=[pltpu.VMEM((h, d), cost.dtype)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(cost, s)


def aggregate_8path_pallas(
    cost: jax.Array,
    p1: float,
    p2: float,
    num_paths: int = 8,
    interpret: bool = False,
    row_chunk: int | None = None,
    col_chunk: int | None = None,
) -> jax.Array:
    """Drop-in equivalent of ops.sgbm.aggregate_8path with VMEM-resident
    carries. Set interpret=True off-TPU (tests).

    row_chunk/col_chunk split the passes into bounded pallas_calls with
    the DP carry handed between chunks as an explicit (aliased) operand —
    bitwise-identical to the single-call program (the carry is the entire
    DP state) while keeping each compiled program below the remote
    compiler's size ceiling (~512 rows on the tunneled environment)."""
    ndir = 3 if num_paths == 8 else 1
    p1 = float(p1)  # python floats: compile-time constants in the kernels
    p2 = float(p2)
    s = jnp.zeros_like(cost)
    s = _row_pass(cost, s, p1, p2, ndir, False, interpret, row_chunk)  # S, SE, SW
    s = _row_pass(cost, s, p1, p2, ndir, True, interpret, row_chunk)  # N, NE, NW
    s = _col_pass(cost, s, p1, p2, False, interpret, chunk=col_chunk)  # E
    s = _col_pass(cost, s, p1, p2, True, interpret, chunk=col_chunk)  # W
    return s
