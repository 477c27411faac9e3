"""Pallas TPU kernel for the 3DMST segmented prefix-sum passes.

The Euler-tour tree filter (ops/mst.py) is built from segmented cumsums
over node order (N) and Euler-event order (2N). The XLA formulation
(`_segmented_cumsum_mm`) is already one triangular matmul per block, but
it materializes the raw block prefixes to HBM, re-reads them through a
full-size (block-local) gather for the reset correction, and broadcasts
a separately-scanned per-block carry — ~5 HBM traversals of the event
array per scan. This kernel is the VERDICT-r2 #2 follow-up ("VMEM-
resident segment carries, like sgbm_pallas.py's DP carries"): one
sequential grid streams the sequence once, keeps every intermediate
(raw prefixes, reset corrections, the open-segment running carry) in
VMEM, and writes the finished scan — read + write, nothing else.

Per 256-lane sub-block (all in VMEM, batch rows on the sublane axis):

    pf   = x @ TRIU                  # inclusive prefix, one MXU matmul
    base = pf @ onehot(corr)         # pf[:, corr[j]], one MXU matmul
    out  = pf - base*has_corr + needs_carry*carry
    carry= out[:, -1]                # value of the segment open at the end

`corr[j]` points at the element just before the last segment reset at or
before j — inside the sub-block whenever `has_corr[j]` (by construction
of the maps), so the correction gather never leaves VMEM. All three maps
pack into one int32 stream (bits 0-15 corr, 16 has_corr, 17 needs_carry),
so map traffic is 1/batch of the data traffic.

Reassociation matches the XLA path block-for-block (same 256-element
blocks, same conditioning bound: ~eps * 256 * max|x|); only the carry
accumulation order differs (sequential here, tree-combined there), which
perturbs results at the fp32 noise floor. Parity: tests/test_mst_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_packed_scan_maps", "segmented_cumsum_pallas"]

_B = 256  # lanes per sub-block (matches ops.mst._SCAN_BLOCK reassociation)
_SUB = 64  # sub-blocks per grid step (VMEM block = batch * _SUB * _B * 4 B)


def build_packed_scan_maps(reset: np.ndarray, block: int = _B) -> np.ndarray:
    """Static per-element scan maps for a sequence with the given reset
    positions, packed into one int32 per element. reset[0] must be True.

    Pad elements (to a block multiple) are each their own dead segment, so
    they scan to their (zero) input and never pollute a carry.
    """
    assert reset[0], "sequence must open with a segment"
    m = reset.size
    pad = (-m) % block
    mp = m + pad
    r = np.zeros(mp, bool)
    r[:m] = reset
    r[m:] = True
    idx = np.arange(mp)
    lrs = np.maximum.accumulate(np.where(r, idx, -1))  # last reset <= idx
    blk_start = (idx // block) * block
    has_corr = (lrs - 1) >= blk_start  # last reset strictly inside the block
    corr_local = np.where(has_corr, lrs - 1 - blk_start, 0)
    needs_carry = lrs < blk_start  # segment opened in an earlier block
    return (
        corr_local | (has_corr << 16) | (needs_carry << 17)
    ).astype(np.int32)


def _dead_block(block: int = _B) -> np.ndarray:
    """Packed maps for one all-reset (dead) padding block."""
    j = np.arange(block)
    return np.where(j > 0, (j - 1) | (1 << 16), 0).astype(np.int32)


def _seg_scan_kernel(sub, x_ref, m_ref, o_ref, carry_ref):
    """Grid over super-blocks; the open-segment carry (kp, 1) persists in
    VMEM scratch across the sequential grid, sgbm_pallas-style."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    b = x_ref.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = (row <= col).astype(jnp.float32)

    def body(s, carry):
        slab = x_ref[:, 0, s, :]  # (kp, B)
        mm = m_ref[0, s, :].reshape(1, b)  # (1, B) int32
        corr = mm & 0xFFFF
        has_corr = ((mm >> 16) & 1).astype(jnp.float32)
        needs_carry = ((mm >> 17) & 1).astype(jnp.float32)
        pf = jax.lax.dot_general(
            slab, tri, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        oh = (row == corr).astype(jnp.float32)  # oh[i, j] = (i == corr[j])
        base = jax.lax.dot_general(
            pf, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # base[k, j] = pf[k, corr[j]]
        out = pf - base * has_corr + needs_carry * carry
        o_ref[:, 0, s, :] = out
        return out[:, b - 1 : b]  # the segment open at the sub-block end

    carry = jax.lax.fori_loop(0, sub, body, carry_ref[:, 0:1])
    carry_ref[...] = jnp.broadcast_to(carry, carry_ref.shape)


def segmented_cumsum_pallas(
    x: jax.Array,
    packed: jax.Array,
    interpret: bool = False,
    sub: int = _SUB,
) -> jax.Array:
    """Inclusive segmented prefix sum along the last axis, segment starts
    per `packed` (from build_packed_scan_maps). Drop-in for
    ops.mst._segmented_cumsum_mm up to fp32 carry reassociation."""
    m = x.shape[-1]
    mp = packed.shape[0]
    lead = x.shape[:-1]
    xb = x.reshape(-1, m).astype(jnp.float32)
    kb = xb.shape[0]
    kp = -(-kb // 8) * 8  # f32 sublane tile
    nb = mp // _B
    sub = min(sub, nb)
    g = -(-nb // sub)
    extra = g * sub - nb
    if extra:
        packed = jnp.concatenate(
            [packed, jnp.asarray(np.tile(_dead_block(), extra))]
        )
    mg = g * sub * _B
    xb = jnp.pad(xb, ((0, kp - kb), (0, mg - m)))
    x4 = xb.reshape(kp, g, sub, _B)
    pk = packed.reshape(g, sub, _B)
    out = pl.pallas_call(
        functools.partial(_seg_scan_kernel, sub),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (kp, 1, sub, _B), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, sub, _B), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kp, 1, sub, _B), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, g, sub, _B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, 128), jnp.float32)],
        interpret=interpret,
    )(x4, pk)
    return out.reshape(kp, mg)[:kb, :m].reshape(lead + (m,))
