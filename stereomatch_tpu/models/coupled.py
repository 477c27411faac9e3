"""Coupled PatchMatch <-> variational alternating engines.

The reference scaffolds two alternating data/smoothness schemes inside
`PatchMatchStereoNL2TGV` but never reaches them (goto FREE_RESOURCE at
src/PatchMatchStereoGPU.cu:7328 skips :7331-7727). This module assembles
their LIVE equivalents from the kernel-level pieces, per SURVEY §2.3
Family E:

  1. `coupled_patchmatch_stereo` — alternate {one Jacobi round of
     PatchMatch over the hybrid census/cost-volume window cost with
     coupling 0.5*theta_d*(d - v)^2 + theta_n*||n - vn||^2
     (stereoMatching_huber, .cu:3273-3581)} with {smooth_iters Huber-ROF
     primal-dual steps smoothing the (d, nx, ny) fields toward the
     PatchMatch output (huberROFSmooth, .cu:3903-4073)}. theta ramps up
     so data and smoothed fields converge together.
  2. `coupled_wta_stereo` — the non-window branch (.cu:7473-7476):
     alternate {TGV-2 smoothing of u with augmented-Lagrangian coupling
     (AL_TGV_* kernels, .cu:4491-4663)} with {coupled WTA over the volume,
     lambda_d*C(d) + L*(u-d) + (u-d)^2/(2 theta)
     (MCCNN_ALTV_CostVolumeWTA, .cu:4748-4803)} and the multiplier update
     L += (u - a)*theta_inv/2 (.cu:4643-4655), theta_inv growing by
     1/(1 - beta*i) per round (.cu:7532).

The coupled PatchMatch variant beats plain WTA+denoise on noisy synthetic
volumes (tests/test_coupled.py) — its window-aggregated data term plus
per-round re-selection does what filtering a fixed WTA map cannot. The
coupled WTA variant halves raw-WTA error but CANNOT beat plain
WTA+denoise on iid per-entry volume noise (the pointwise data readout has
SNR < 1 there; documented in the test and CLAUDE.md) — it is the faithful
live assembly of the reference's non-window branch, not the recommended
engine for noisy volumes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CoupledConfig
from ..ops.coupled import (
    coupled_plane_cost,
    huber_rof_field_step,
    init_fields,
)
from ..ops.patchmatch import PlaneState, _nz
from ..ops.select import wta_coupled, wta_disparity
from ..ops.tgv import TGVParams, diffusion_tensor, _fwd_diff, _div
from ..ops.variational import edge_weight

__all__ = ["coupled_patchmatch_stereo", "coupled_wta_stereo", "CoupledOutput"]


class CoupledOutput(NamedTuple):
    disparity: jax.Array  # (H, W) in [0, max_disp]
    smoothed: jax.Array  # the variational field v (same units)
    planes: PlaneState | None


def _coupled_update(key_i, planes, fields, bgr, vol, cfg, sign, theta_d, theta_n):
    """One Jacobi data-step round (stereoMatching_huber, .cu:3273-3581):
    3x3 spatial propagation (planes taken at FACE VALUE — the reference
    uses the neighbor's d directly at (x, y), .cu:3316-3325, no plane
    extension), then annealed plane refinement. View propagation is
    handled by the caller between views. The current label re-scores via
    the (0,0) tap since min_cost restarts at 1e10 each round (.cu:3306) —
    necessary because the coupling target v moves every round."""
    h, w = planes.d.shape

    def cost_of(p):
        return coupled_plane_cost(
            bgr, vol, p, fields, cfg, sign, theta_d, theta_n
        )

    def try_candidate(state, cand):
        pl, c = state
        c_new = cost_of(cand)
        better = c_new < c
        return (
            PlaneState(
                jnp.where(better, cand.nx, pl.nx),
                jnp.where(better, cand.ny, pl.ny),
                jnp.where(better, cand.d, pl.d),
            ),
            jnp.where(better, c_new, c),
        )

    # current label re-scored from scratch
    state = (planes, cost_of(planes))

    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(0, 1))

    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (1, -1), (-1, 1), (-1, -1)):
        cand = PlaneState(
            shift(planes.nx, dy, dx), shift(planes.ny, dy, dx), shift(planes.d, dy, dx)
        )
        state = try_candidate(state, cand)

    # annealed refinement (delta halving maxDisp/2 while >= 0.1, s halving
    # from 1, .cu:3383-3443). NOTE this >= bound follows the GPU kernels
    # (.cu:1835, :3391); ops/mst.py::refine_deltas uses > 0.1 following
    # Stereo3DMST.cpp's CPU loop — the two references genuinely differ by
    # one refinement level, so the schedules are intentionally separate.
    deltas = []
    dd, s = 0.5 * cfg.max_disp, 1.0
    while dd >= 0.1:
        deltas.append((dd, s))
        dd, s = dd * 0.5, s * 0.5
    for j, (dd, s) in enumerate(deltas):
        pl, c = state
        kj = jax.random.fold_in(key_i, j)
        u = jax.random.uniform(kj, (4, h, w), minval=-1.0, maxval=1.0)
        nd = pl.d + u[0] * dd
        nz0 = _nz(pl.nx, pl.ny) + u[1] * s
        nx = pl.nx + u[2] * s
        ny = pl.ny + u[3] * s
        norm = jnp.sqrt(nx * nx + ny * ny + nz0 * nz0)
        nx, ny = nx / norm, ny / norm
        ok = (nd >= 0.0) & (nd <= cfg.max_disp) & (nx * nx + ny * ny < 1.0)
        cand = PlaneState(
            jnp.where(ok, nx, pl.nx),
            jnp.where(ok, ny, pl.ny),
            jnp.where(ok, nd, pl.d),
        )
        state = try_candidate(state, cand)
    return state


@partial(jax.jit, static_argnames=("cfg",))
def coupled_patchmatch_stereo(
    key: jax.Array,
    base_bgr: jax.Array,  # (H, W, 3) [0, 255]
    base_vol: jax.Array,  # (H, W, D) matching cost
    cfg: CoupledConfig = CoupledConfig(),
    sign: int = -1,
) -> CoupledOutput:
    """Single-view coupled PatchMatch <-> Huber-ROF alternation (see module
    doc). Returns disparities in [0, max_disp]; `smoothed` is the
    variational field (the quantity the reference's dead loop would have
    output, .cu:7320)."""
    h, w = base_vol.shape[:2]
    k0, kloop = jax.random.split(key)

    # init: fronto-parallel planes at the volume's WTA (the reference
    # warm-starts with uncoupled PMS rounds, .cu:7334-7371; WTA is the
    # cheap equivalent)
    d0 = jnp.clip(wta_disparity(base_vol, 0), 0.0, float(cfg.max_disp))
    planes = PlaneState(jnp.zeros((h, w)), jnp.zeros((h, w)), d0)
    gray = 0.114 * base_bgr[..., 0] + 0.587 * base_bgr[..., 1] + 0.299 * base_bgr[..., 2]
    gp = edge_weight(gray)
    fields = init_fields(d0 / float(cfg.max_disp), planes.nx, planes.ny)

    def outer(carry, it):
        planes, fields = carry
        t = it.astype(jnp.float32) / max(cfg.outer_iterations - 1, 1)
        theta_d = cfg.theta_d_start + (cfg.theta_d_end - cfg.theta_d_start) * t
        theta_n = cfg.theta_n_start + (cfg.theta_n_end - cfg.theta_n_start) * t

        def smooth(_, st):
            return huber_rof_field_step(
                st, planes.d / float(cfg.max_disp), planes.nx, planes.ny,
                gp, theta_d, theta_n, cfg.huber_eps,
            )

        fields = jax.lax.fori_loop(0, cfg.smooth_iters, smooth, fields)
        key_i = jax.random.fold_in(kloop, it)
        planes, _ = _coupled_update(
            key_i, planes, fields, base_bgr, base_vol, cfg, sign, theta_d, theta_n
        )
        return (planes, fields), None

    (planes, fields), _ = jax.lax.scan(
        outer, (planes, fields), jnp.arange(cfg.outer_iterations)
    )
    return CoupledOutput(
        planes.d, jnp.clip(fields.vd, 0.0, 1.0) * float(cfg.max_disp), planes
    )


@partial(jax.jit, static_argnames=("cfg", "tgv_params", "tgv"))
def coupled_wta_stereo(
    base_vol: jax.Array,  # (H, W, D)
    guide_gray: jax.Array,  # (H, W) [0, 255]
    cfg: CoupledConfig = CoupledConfig(),
    tgv_params: TGVParams = TGVParams(),
    tgv: bool = True,
) -> CoupledOutput:
    """AL-TGV <-> coupled-WTA alternation (the reference loop's live
    non-window branch, .cu:7405-7534). All fields in [0, 1] internally
    (the reference normalizes by Dmax, .cu:6941-6952)."""
    h, w, nd = base_vol.shape
    max_d = float(nd - 1)

    g = diffusion_tensor(
        guide_gray * (1.0 / 255.0), None, tgv_params.tensor_a, tgv_params.tensor_b
    )
    g00, g01, g11 = g[..., 0], g[..., 1], g[..., 3]

    a0 = wta_disparity(base_vol, 0) / max_d
    z = jnp.zeros_like(a0)
    state0 = (a0, a0, z, z, z, z, z, z, z, z, z, jnp.float32(cfg.theta_inv0))
    # (u, a, L, vx, vy, px, py, qxx, qxy, qyx, qyy, theta_inv)

    def outer(carry, i):
        u, a, lagr, vx, vy, px, py, qxx, qxy, qyx, qyy, theta_inv = carry

        def smooth(_, st):
            u, vx, vy, px, py, qxx, qxy, qyx, qyy = st
            du_dx, du_dy = _fwd_diff(u)
            ex, ey = du_dx - vx, du_dy - vy
            px_n = px + tgv_params.tau_p * (g00 * ex + g01 * ey)
            py_n = py + tgv_params.tau_p * (g01 * ex + g11 * ey)
            norm = jnp.maximum(
                1.0, jnp.sqrt(px_n * px_n + py_n * py_n) / tgv_params.lambda_s
            )
            px_n, py_n = px_n / norm, py_n / norm
            if tgv:
                dvx_dx, dvx_dy = _fwd_diff(vx)
                dvy_dx, dvy_dy = _fwd_diff(vy)
                qxx_n = qxx + tgv_params.tau_q * dvx_dx
                qxy_n = qxy + tgv_params.tau_q * dvx_dy
                qyx_n = qyx + tgv_params.tau_q * dvy_dx
                qyy_n = qyy + tgv_params.tau_q * dvy_dy
                qn = jnp.sqrt(qxx_n**2 + qxy_n**2 + qyx_n**2 + qyy_n**2)
                qs = jnp.maximum(1.0, qn / tgv_params.lambda_a)
                qxx_n, qxy_n = qxx_n / qs, qxy_n / qs
                qyx_n, qyy_n = qyx_n / qs, qyy_n / qs
            else:
                qxx_n, qxy_n, qyx_n, qyy_n = qxx, qxy, qyx, qyy
            gpx = g00 * px_n + g01 * py_n
            gpy = g01 * px_n + g11 * py_n
            u_t = (
                u
                + tgv_params.tau_u * _div(gpx, gpy)
                - tgv_params.tau_u * lagr
                + tgv_params.tau_u * theta_inv * a
            ) / (1.0 + tgv_params.tau_u * theta_inv)
            u_t = jnp.clip(u_t, 0.0, 1.0)
            u_n = 2.0 * u_t - u
            if tgv:
                vx_t = vx + tgv_params.tau_v * (px_n + _div(qxx_n, qxy_n))
                vy_t = vy + tgv_params.tau_v * (py_n + _div(qyx_n, qyy_n))
                vx_n, vy_n = 2.0 * vx_t - vx, 2.0 * vy_t - vy
            else:
                vx_n, vy_n = vx, vy
            return (u_n, vx_n, vy_n, px_n, py_n, qxx_n, qxy_n, qyx_n, qyy_n)

        u, vx, vy, px, py, qxx, qxy, qyx, qyy = jax.lax.fori_loop(
            0, cfg.smooth_iters, smooth, (u, vx, vy, px, py, qxx, qxy, qyx, qyy)
        )
        # coupled WTA re-selection (MCCNN_ALTV_CostVolumeWTA, .cu:4748-4803);
        # u and L live in [0,1] units while wta_coupled's d axis is in
        # pixels, so L scales by 1/max_d and theta_inv by 1/max_d^2:
        # L*(u-d)_01 + 0.5*theta*(u-d)_01^2 exactly
        a = (
            wta_coupled(base_vol, u * max_d, lagr / max_d, cfg.lambda_d,
                        theta_inv / (max_d * max_d), 0)
            / max_d
        )
        a = jnp.clip(a, 0.0, 1.0)
        # multiplier + theta annealing (.cu:4643-4655, :7532)
        lagr = lagr + (u - a) * 0.5 * theta_inv
        theta_inv = theta_inv / jnp.maximum(
            1.0 - cfg.beta_anneal * i.astype(jnp.float32), 0.05
        )
        return (u, a, lagr, vx, vy, px, py, qxx, qxy, qyx, qyy, theta_inv), None

    state, _ = jax.lax.scan(outer, state0, jnp.arange(cfg.outer_iterations))
    u, a = state[0], state[1]
    return CoupledOutput(a * max_d, u * max_d, None)
