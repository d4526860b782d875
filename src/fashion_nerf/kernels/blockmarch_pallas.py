"""Carry-in-VMEM block march: grid=(ray tiles, sample blocks), ONE block per
program, transmittance carry + composited accumulators persisted in VMEM
output windows across the tile's (sequential) block programs.

This is the middle design point between the two-stage pipeline
(render/blockwise.py: Pallas field + XLA carry glue per block) and the
rejected megakernel (kernels/megakernel_pallas.py: whole march NB-unrolled in
one program — its sequencing cost grew with the body, config.py:85-94). Here
the per-program body stays one block (small, pipelinable: Pallas
double-buffers the t/d block DMAs across programs) while the per-block XLA
glue — carry update, pts build, rgb/σ HBM round-trips — moves in-kernel
(VERDICT r2 next #1b; CLAUDE.md backlog #1).

Layout notes inherited from the megakernel (measured on v5e):
- MLP runs in rows-of-features; Mosaic supports the (rows,1)→(rpt,SB)
  reshape but not the reverse, so row-layout t comes from the (rpt,SB)
  block via an iota-mask select, and volrend math runs in matrix layout.
- exclusive log-T prefix = strict-upper (SB,SB) ones matmul.
- in-kernel o + d·t rounds ~1 ulp differently than XLA's fused fma; posenc
  amplifies by 2^{L-1} → cross-path agreement ~1e-4/pass (test tolerances).

Per-(tile, block) predication folds THREE kill signals: AABB hit, live
transmittance (read from the in-VMEM carry — no XLA round-trip), and the
macro-box block-interval test (core/occupancy.ray_multi_aabb).

Reference@v1 ships no renderer (/root/reference/README.md:1-2); the pattern
is NerfAcc-style early termination re-thought for static shapes + the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashion_nerf.kernels.posenc_mlp_pallas import (
    _INTERLEAVE, _TILE, _freq_row, _phase_offset, mlp_rows)

_LOG_FLOOR = -23.025851   # log(1e-10): mirrors core.volrend's cumprod clamp


def _carry_kernel(plan, L, SB, rpt, log_eps, softplus, il, has_cond,
                  hit_ref, bhit_ref, o_ref, dv_ref, dirpart_ref, *refs):
    if has_cond:
        condpart_ref, *refs = refs
    else:
        condpart_ref = None
    tmat_ref, dmat_ref, fmat_ref, off_ref, ut_ref, *refs = refs
    n_w = len(refs) - 5
    w_refs = refs[:n_w]
    rgb_ref, depth_ref, acc_ref, w_ref, logT_ref = refs[n_w:]
    ws = [r[:] for r in w_refs]
    rH = rpt // il            # rays per interleave slice
    rows = rH * SB            # MLP rows per slice
    fmat, off = fmat_ref[:], off_ref[:]
    ut = ut_ref[:]
    b = pl.program_id(1)

    # accumulator windows map to (t, 0): they stay resident in VMEM across
    # the tile's sequential block programs and flush once per tile
    @pl.when(b == 0)
    def _init():
        rgb_ref[:] = jnp.zeros_like(rgb_ref)
        depth_ref[:] = jnp.zeros_like(depth_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        logT_ref[:] = jnp.zeros_like(logT_ref)

    hit = hit_ref[:]                                   # (rpt, 1) f32
    bhit = bhit_ref[:]                                 # (rpt, 1) f32
    logT_now = logT_ref[:]
    alive = jnp.max(jnp.where(
        (hit > 0.0) & (bhit > 0.0) & (logT_now > log_eps), 1.0, 0.0))

    def _expand(v):
        # per-ray rows → per-sample rows (ray-major): the supported
        # broadcast+leading-collapse direction
        return jnp.broadcast_to(
            v[:, None, :], (v.shape[0], SB, v.shape[-1])
        ).reshape(v.shape[0] * SB, v.shape[-1])

    @pl.when(alive > 0.0)
    def _block():
        for j in range(il):
            rsl = pl.ds(j * rH, rH)                    # ray slice
            t_bj = tmat_ref[rsl, :]                    # (rH, SB)
            # row-layout t via iota-mask select (megakernel rationale)
            t_exp = jnp.broadcast_to(
                t_bj[:, None, :], (rH, SB, SB)).reshape(rows, SB)
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, SB), 1)
            srow = jax.lax.broadcasted_iota(jnp.int32, (rows, SB), 0) % SB
            t_rows = jnp.sum(jnp.where(lane == srow, t_exp, 0.0),
                             axis=1, keepdims=True)    # (rows, 1)
            pts = _expand(o_ref[rsl, :]) + _expand(dv_ref[rsl, :]) * t_rows
            d_j = _expand(dirpart_ref[rsl, :])
            c_j = _expand(condpart_ref[rsl, :]) if has_cond else None
            rgb, sig = mlp_rows(plan, L, ws, fmat, off, pts, d_j, c_j)

            dens = (jax.nn.softplus(sig) if softplus
                    else jnp.maximum(sig, 0.0))
            dens_m = dens.reshape(rH, SB)              # rows→matrix relayout
            d_b = dmat_ref[rsl, :]
            x = dens_m * d_b
            log_om = jnp.maximum(-x, _LOG_FLOOR)
            csum_ex = jnp.dot(log_om, ut,
                              preferred_element_type=jnp.float32)
            logT_j = logT_ref[rsl, :]
            logT_in = logT_j + csum_ex                 # (rH, SB)
            alpha = 1.0 - jnp.exp(-x)
            w = alpha * jnp.exp(logT_in)
            w_ref[rsl, :] = w

            parts = [jnp.sum(w * rgb[:, c:c + 1].reshape(rH, SB),
                             axis=1, keepdims=True) for c in range(3)]
            rgb_ref[rsl, :] += jnp.concatenate(parts, axis=1)
            depth_ref[rsl, :] += jnp.sum(w * t_bj, axis=1, keepdims=True)
            acc_ref[rsl, :] += jnp.sum(w, axis=1, keepdims=True)
            logT_ref[rsl, :] = logT_j + jnp.sum(log_om, axis=1,
                                                keepdims=True)

    @pl.when(alive <= 0.0)
    def _dead():
        # the (t, b) weights window is per-block output: unwritten VMEM is
        # garbage on hardware — dead blocks contribute exact zero weight
        w_ref[:] = jnp.zeros_like(w_ref)


@functools.partial(
    jax.jit, static_argnames=("plan", "L", "SB", "softplus", "log_eps",
                              "interpret"))
def _carry_eval(weight_arrs, dirpart, condpart, rays_o, rays_d, hit,
                block_hit, t_pad, d_pad, plan, L, SB, softplus, log_eps,
                interpret=False):
    """One marched pass over (R, S_pad) samples with the carry in VMEM.

    t_pad/d_pad: per-sample positions / scaled interval widths (zero-width
    sentinels on padding). hit: (R, 1) f32 AABB-hit flags. block_hit:
    (R, NB) f32 macro-box block-interval flags (all-ones when no grid).
    condpart: per-ray (R, cw) hoisted cond rows or None.
    Returns (rgb (R,3), depth (R,), acc (R,), weights (R,S_pad), logT (R,)).
    """
    R, S_pad = t_pad.shape
    assert S_pad % SB == 0, (S_pad, SB)
    NB = S_pad // SB
    rpt = _TILE // SB
    assert R % rpt == 0, (R, rpt)
    assert rpt % _INTERLEAVE == 0, (rpt, _INTERLEAVE)
    n_tiles = R // rpt
    has_cond = condpart is not None
    assert has_cond == any(t.endswith("_c") for t in plan), plan
    assert block_hit.shape == (R, NB), (block_hit.shape, R, NB)

    fmat = jnp.asarray(_freq_row(max(L, 1)))
    foff = jnp.asarray(_phase_offset(max(L, 1)))
    ut = jnp.asarray(np.triu(np.ones((SB, SB), np.float32), 1))

    kernel = functools.partial(
        _carry_kernel, plan, L, SB, rpt, float(log_eps), softplus,
        _INTERLEAVE, has_cond)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda t, b: (0, 0),
                            memory_space=pltpu.VMEM)

    def _per_tile(width):
        return pl.BlockSpec((rpt, width), lambda t, b: (t, 0),
                            memory_space=pltpu.VMEM)

    def _per_block(width):
        return pl.BlockSpec((rpt, width), lambda t, b: (t, b),
                            memory_space=pltpu.VMEM)

    cond_inputs = (condpart,) if has_cond else ()
    in_specs = [
        _per_tile(1),                                  # hit
        _per_block(1),                                 # block_hit
        _per_tile(3),                                  # rays_o
        _per_tile(3),                                  # rays_d
        _per_tile(dirpart.shape[1]),                   # dirpart
    ] + [_per_tile(a.shape[1]) for a in cond_inputs] + [
        _per_block(SB),                                # t block
        _per_block(SB),                                # dists block
        _const2d(fmat), _const2d(foff), _const2d(ut),
    ] + [_const2d(a) for a in weight_arrs]

    out_specs = (_per_tile(3), _per_tile(1), _per_tile(1), _per_block(SB),
                 _per_tile(1))
    out_shape = (
        jax.ShapeDtypeStruct((R, 3), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((R, S_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
    )

    flops_row = 2 * 0.53e6
    rgb, depth, acc, w, logT = pl.pallas_call(
        kernel,
        grid=(n_tiles, NB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(R * S_pad * flops_row),
            bytes_accessed=int(R * S_pad * 12),
            transcendentals=int(R * S_pad * (6 * L + 3)),
        ),
        interpret=interpret,
    )(hit, block_hit, rays_o, rays_d, dirpart, *cond_inputs, t_pad, d_pad,
      fmat, foff, ut, *weight_arrs)
    return rgb, depth[:, 0], acc[:, 0], w, logT[:, 0]
