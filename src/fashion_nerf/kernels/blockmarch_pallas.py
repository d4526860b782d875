"""Carry-in-VMEM block march: grid=(ray tiles, sample blocks), ONE block per
program, transmittance carry + composited accumulators persisted in VMEM
output windows across the tile's (sequential) block programs.

This is the middle design point between the two-stage pipeline
(render/blockwise.py: Pallas field + XLA carry glue per block) and the
retired megakernel (r2–r4: whole march NB-unrolled in one program — its
sequencing cost grew with the body; see the KernelConfig note + git log). Here
the per-program body stays one block (small, pipelinable) while the per-block
XLA glue — carry update, pts build, rgb/σ HBM round-trips — moves in-kernel
(VERDICT r2 next #1b; CLAUDE.md backlog #1).

Window layout: Mosaic requires block lane counts divisible by 128 or equal
to the full array width, so the (R, S_pad) t/dists/weights arrays use
per-TILE full-width windows mapped (t, 0) — loaded/flushed ONCE per tile,
reused across its block programs — and the kernel selects block b's SB lanes
with dynamic lane slices (pl.ds on a multiple_of-hinted offset). Narrow
per-(t, b) windows like (rpt, SB=32) are rejected by the TPU lowering
(measured r3; interpret mode does not enforce the rule).

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


def _carry_kernel(plan, L, SB, rpt, NB, log_eps, softplus, il, has_cond,
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
    off_b = pl.multiple_of(b * SB, SB)

    # accumulator windows map to (t, 0): they stay resident in VMEM across
    # the tile's sequential block programs and flush once per tile
    @pl.when(b == 0)
    def _init():
        rgb_ref[:] = jnp.zeros_like(rgb_ref)
        depth_ref[:] = jnp.zeros_like(depth_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        w_ref[:] = jnp.zeros_like(w_ref)
        logT_ref[:] = jnp.zeros_like(logT_ref)

    hit = hit_ref[:]                                   # (rpt, 1) f32
    # block b's macro-box flags: column select from the (rpt, NB) window
    # via iota mask (NB is a handful of lanes; a dynamic 1-lane slice would
    # relayout for no benefit)
    bh_all = bhit_ref[:]
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, bh_all.shape, 1)
    bhit = jnp.max(jnp.where(lane_nb == b, bh_all, 0.0), axis=1,
                   keepdims=True)                      # (rpt, 1)
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
        # dynamic-offset selector (SB, S_pad): sel[i, j] = (j == off_b + i).
        # Mosaic rejects dynamic lane-offset vector loads/stores, so block
        # b's lanes are gathered/scattered with tiny MXU matmuls instead
        # (module docstring)
        s_col = jax.lax.broadcasted_iota(jnp.int32, (SB, tmat_ref.shape[1]),
                                         1)
        s_row = jax.lax.broadcasted_iota(jnp.int32, (SB, tmat_ref.shape[1]),
                                         0)
        sel = jnp.where(s_col == s_row + off_b, 1.0, 0.0).astype(jnp.float32)

        def gather(full):                              # (rH,S_pad)→(rH,SB)
            # HIGHEST precision: the default MXU pass rounds the operand to
            # bf16 — a t≈4.0 gathered at bf16x2 lands ~2e-5 off, which the
            # textured field amplifies ~100× (measured: coarse-pass rms
            # 1.2e-3 vs two-stage, −1.6 dB vs GT end-to-end)
            return jax.lax.dot_general(
                full, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        for j in range(il):
            rsl = pl.ds(j * rH, rH)                    # ray slice
            t_bj = gather(tmat_ref[rsl, :])            # (rH, SB)
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
            d_b = gather(dmat_ref[rsl, :])
            x = dens_m * d_b
            log_om = jnp.maximum(-x, _LOG_FLOOR)
            # HIGHEST: log_om reaches −23·SB; a bf16-pass product rounds
            # the exclusive prefix enough to shift exp(logT) visibly
            csum_ex = jnp.dot(log_om, ut,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            logT_j = logT_ref[rsl, :]
            logT_in = logT_j + csum_ex                 # (rH, SB)
            alpha = 1.0 - jnp.exp(-x)
            w = alpha * jnp.exp(logT_in)
            # disjoint-lane scatter-add into the zero-initialized window
            # (HIGHEST: default MXU precision would round the WEIGHTS to
            # bf16 — these feed the coarse→fine CDF resample)
            w_ref[rsl, :] += jnp.dot(w, sel,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)

            parts = [jnp.sum(w * rgb[:, c:c + 1].reshape(rH, SB),
                             axis=1, keepdims=True) for c in range(3)]
            rgb_ref[rsl, :] += jnp.concatenate(parts, axis=1)
            depth_ref[rsl, :] += jnp.sum(w * t_bj, axis=1, keepdims=True)
            acc_ref[rsl, :] += jnp.sum(w, axis=1, keepdims=True)
            logT_ref[rsl, :] = logT_j + jnp.sum(log_om, axis=1,
                                                keepdims=True)


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
    has_cond = condpart is not None
    assert has_cond == any(t.endswith("_c") for t in plan), plan
    # conditioned plans halve the tile (posenc_mlp_pallas._fused_eval
    # rationale: the condpart expansion pushes the VMEM scope over budget)
    rpt = (_TILE // 2 if has_cond else _TILE) // SB
    assert R % rpt == 0, (R, rpt)
    assert rpt % _INTERLEAVE == 0, (rpt, _INTERLEAVE)
    n_tiles = R // rpt
    assert block_hit.shape == (R, NB), (block_hit.shape, R, NB)

    fmat = jnp.asarray(_freq_row(max(L, 1)))
    foff = jnp.asarray(_phase_offset(max(L, 1)))
    ut = jnp.asarray(np.triu(np.ones((SB, SB), np.float32), 1))

    kernel = functools.partial(
        _carry_kernel, plan, L, SB, rpt, NB, float(log_eps), softplus,
        _INTERLEAVE, has_cond)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda t, b: (0, 0),
                            memory_space=pltpu.VMEM)

    def _per_tile(width):
        # full-width per-tile windows, revisited across the tile's block
        # programs (loaded/flushed once per tile — see module docstring)
        return pl.BlockSpec((rpt, width), lambda t, b: (t, 0),
                            memory_space=pltpu.VMEM)

    cond_inputs = (condpart,) if has_cond else ()
    in_specs = [
        _per_tile(1),                                  # hit
        _per_tile(NB),                                 # block_hit
        _per_tile(3),                                  # rays_o
        _per_tile(3),                                  # rays_d
        _per_tile(dirpart.shape[1]),                   # dirpart
    ] + [_per_tile(a.shape[1]) for a in cond_inputs] + [
        _per_tile(S_pad),                              # t matrix
        _per_tile(S_pad),                              # dists matrix
        _const2d(fmat), _const2d(foff), _const2d(ut),
    ] + [_const2d(a) for a in weight_arrs]

    out_specs = (_per_tile(3), _per_tile(1), _per_tile(1), _per_tile(S_pad),
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
        # tiles are independent (parallel); a tile's block programs carry
        # the transmittance through revisited VMEM windows, so the block
        # dimension must stay sequential (arbitrary)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(hit, block_hit, rays_o, rays_d, dirpart, *cond_inputs, t_pad, d_pad,
      fmat, foff, ut, *weight_arrs)
    return rgb, depth[:, 0], acc[:, 0], w, logT[:, 0]
