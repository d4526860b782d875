"""TPU megakernel: one Pallas program marches ALL sample blocks of a ray
tile — MLP, transmittance carry, and compositing fused (SURVEY.md §2.1
substrate; the long-ray/blockwise story of §5.7).

Why it exists (measured, scripts/glue_bisect.py on v5e): in the two-stage
blockwise pipeline (render/blockwise.py) the XLA glue between block launches
is only ~8 ms/chunk, but the per-PROGRAM fixed cost of the Pallas launches is
~10 µs × 512 tiles × 8 block-launches ≈ 42 ms/chunk — paid even when every
tile is dead. Folding the block loop INSIDE the program amortizes that
overhead NB×, and the carry never leaves VMEM.

Layout strategy (the MLP wants rows-of-features, the scan wants
rays×samples): Mosaic supports the (T,1)→(rpt,SB) reshape but NOT the
reverse, so the kernel computes the MLP in row layout, relays σ/rgb into
matrix layout (4 small supported-direction reshapes per block), and does all
volrend math there: exclusive log-transmittance prefix via a strict-upper
(SB,SB) ones matmul, weighted reductions as lane sums. Ray positions need
row-layout t, which cannot be derived in-kernel from the (rpt,SB) block —
the wrapper streams t in BOTH layouts (a single XLA transpose per pass).

Per-block early termination: one `pl.when` per sample block on
max(hit ∧ log T > log ε) — terminated/background tiles skip the block's
entire MXU workload, and a fully-dead tile costs only the flag checks.

Reference@v1 ships no renderer at all (/root/reference/README.md:1-2); the
early-termination pattern follows NerfAcc (PAPERS.md) re-thought for static
shapes and the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashion_nerf.kernels.posenc_mlp_pallas import (
    _INTERLEAVE, _TILE, _freq_row, _phase_offset, mlp_rows, pack_params)

_LOG_FLOOR = -23.025851   # log(1e-10): mirrors core.volrend's cumprod clamp

_MEGA_ROWS = 1024  # MLP rows per (tile, block) step: 2048 (the forward
                   # kernel's tile) measured 438 KB over the 16 MB VMEM
                   # budget here — the block loop keeps carry state and the
                   # (rpt, S_pad) outputs resident on top of the MLP
                   # transients. 1024 also halves the termination tile to
                   # rpt = 1024/SB rays (finer alive granularity).


def _mega_kernel(plan, L, NB, SB, rpt, S_pad, log_eps, softplus, il,
                 hit_ref, o_ref, dv_ref, dirpart_ref,
                 tmat_ref, dmat_ref, fmat_ref, off_ref, ut_ref, *refs):
    n_w = len(refs) - 5
    w_refs = refs[:n_w]
    rgb_ref, depth_ref, acc_ref, w_ref, logT_ref = refs[n_w:]
    ws = [r[:] for r in w_refs]
    T = rpt * SB
    rH = rpt // il            # rays per interleave slice
    rows = rH * SB            # MLP rows per slice
    fmat, off = fmat_ref[:], off_ref[:]
    ut = ut_ref[:]

    rgb_ref[:] = jnp.zeros_like(rgb_ref)
    depth_ref[:] = jnp.zeros_like(depth_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    w_ref[:] = jnp.zeros_like(w_ref)
    logT_ref[:] = jnp.zeros_like(logT_ref)

    hit = hit_ref[:]                                   # (rpt, 1) f32

    def _expand(v):
        # per-ray rows → per-sample rows (ray-major): the supported
        # broadcast+leading-collapse direction
        return jnp.broadcast_to(
            v[:, None, :], (v.shape[0], SB, v.shape[-1])
        ).reshape(v.shape[0] * SB, v.shape[-1])

    for b in range(NB):                                # static unroll
        logT_now = logT_ref[:]
        alive = jnp.max(jnp.where(
            (hit > 0.0) & (logT_now > log_eps), 1.0, 0.0))

        @pl.when(alive > 0.0)
        def _block(b=b):
            for j in range(il):
                rsl = pl.ds(j * rH, rH)                # ray slice
                # Row-layout t from the (rH, SB) matrix block via an
                # iota-mask select: streaming per-sample rows from the host
                # lane-pads (rows,1)/(rows,3) windows ×128 in VMEM (measured
                # 12.3 MB over budget at S_pad=192), and the matrix→rows
                # reshape is unsupported. In-kernel o + d·t rounds ~1 ulp
                # differently than the XLA-fused fma — the posenc amplifies
                # that by 2^{L-1}, so cross-path equivalence is ~1e-4/pass,
                # absorbed by the test tolerances.
                t_bj = tmat_ref[rsl, pl.ds(b * SB, SB)]      # (rH, SB)
                t_exp = jnp.broadcast_to(
                    t_bj[:, None, :], (rH, SB, SB)).reshape(rows, SB)
                lane = jax.lax.broadcasted_iota(jnp.int32, (rows, SB), 1)
                srow = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, SB), 0) % SB
                t_rows = jnp.sum(
                    jnp.where(lane == srow, t_exp, 0.0),
                    axis=1, keepdims=True)                   # (rows, 1)
                pts = _expand(o_ref[rsl, :]) \
                    + _expand(dv_ref[rsl, :]) * t_rows
                d_j = _expand(dirpart_ref[rsl, :])
                rgb, sig = mlp_rows(plan, L, ws, fmat, off, pts, d_j)

                dens = (jax.nn.softplus(sig) if softplus
                        else jnp.maximum(sig, 0.0))
                dens_m = dens.reshape(rH, SB)          # rows→matrix relayout
                d_b = dmat_ref[rsl, pl.ds(b * SB, SB)]
                x = dens_m * d_b
                log_om = jnp.maximum(-x, _LOG_FLOOR)
                csum_ex = jnp.dot(log_om, ut,
                                  preferred_element_type=jnp.float32)
                logT_j = logT_ref[rsl, :]
                logT_in = logT_j + csum_ex             # (rH, SB)
                alpha = 1.0 - jnp.exp(-x)
                w = alpha * jnp.exp(logT_in)
                w_ref[rsl, pl.ds(b * SB, SB)] = w

                parts = [jnp.sum(w * rgb[:, c:c + 1].reshape(rH, SB),
                                 axis=1, keepdims=True) for c in range(3)]
                rgb_ref[rsl, :] += jnp.concatenate(parts, axis=1)
                t_b = tmat_ref[rsl, pl.ds(b * SB, SB)]
                depth_ref[rsl, :] += jnp.sum(w * t_b, axis=1, keepdims=True)
                acc_ref[rsl, :] += jnp.sum(w, axis=1, keepdims=True)
                logT_ref[rsl, :] = logT_j + jnp.sum(log_om, axis=1,
                                                    keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("plan", "L", "SB", "softplus", "log_eps",
                              "interpret"))
def _mega_eval(weight_arrs, dirpart, rays_o, rays_d, hit, t_pad, d_pad,
               plan, L, SB, softplus, log_eps, interpret=False):
    """One marched pass over (R, S_pad) samples. t_pad/d_pad carry the
    per-sample positions/scaled interval widths (zero-width sentinels on
    padding). Returns (rgb (R,3), depth (R,), acc (R,), weights (R,S_pad),
    logT (R,))."""
    R, S_pad = t_pad.shape
    assert S_pad % SB == 0, (S_pad, SB)
    NB = S_pad // SB
    rpt = _MEGA_ROWS // SB
    assert R % rpt == 0, (R, rpt)
    assert rpt % _INTERLEAVE == 0, (rpt, _INTERLEAVE)
    n_tiles = R // rpt
    T = rpt * SB

    fmat = jnp.asarray(_freq_row(max(L, 1)))
    foff = jnp.asarray(_phase_offset(max(L, 1)))
    ut = jnp.asarray(np.triu(np.ones((SB, SB), np.float32), 1))

    kernel = functools.partial(
        _mega_kernel, plan, L, NB, SB, rpt, S_pad,
        float(log_eps), softplus, _INTERLEAVE)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _tiled(width):
        return pl.BlockSpec((rpt, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        _tiled(1),                                     # hit
        _tiled(3),                                     # rays_o
        _tiled(3),                                     # rays_d
        _tiled(dirpart.shape[1]),                      # dirpart
        _tiled(S_pad),                                 # t matrix
        _tiled(S_pad),                                 # dists matrix
        _const2d(fmat), _const2d(foff), _const2d(ut),
    ] + [_const2d(a) for a in weight_arrs]

    out_specs = (_tiled(3), _tiled(1), _tiled(1), _tiled(S_pad), _tiled(1))
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
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(R * S_pad * flops_row),
            bytes_accessed=int(R * S_pad * 12),
            transcendentals=int(R * S_pad * (6 * L + 3)),
        ),
        # the NB-unrolled march keeps ~16.2 MB of scoped stack live at peak
        # (214 KB past the 16 MB default); v5e's physical VMEM comfortably
        # covers a raised scope
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(hit, rays_o, rays_d, dirpart, t_pad, d_pad, fmat, foff, ut,
      *weight_arrs)
    return rgb, depth[:, 0], acc[:, 0], w, logT[:, 0]
