"""Slim σ-only march for the proposal pass: the carry-march body with every
per-row cost a PDF-shaping pass does not need removed (r4 backlog #1).

Why a third eval path exists: after the r4 proposal work the frame was ~92%
two marches (prop 177 ms + fine 180 of 417), and the per-program anatomy
showed the PROP march is ~90% per-row VPU body — posenc prep, narrow-lane
(rows,3)/(rows,1) ops at 3/128 lane efficiency, matrix→rows relayouts —
against ~2 µs of MXU need (BASELINE.md r4). The fine march is AT its MXU
floor; the prop march is not, and its per-row body is full of work that only
an rgb-compositing pass needs. This kernel marches a σ-only `heads_plain`
net over ONE sample block per ray (the production prop shape: eval_n ≤
block_samples ⇒ NB = 1) with:

- NO dirpart window/expand (heads_plain never consumes it — the generic
  kernel still materializes a (rows, 128) bf16 broadcast per program);
- NO rgb head sigmoid, NO rgb compositing (3 × relayout+mul+reduce), NO
  depth accumulation — the PDF consumes weights; culling consumes acc;
- NO selector gather/scatter matmuls and NO cross-block carry (NB = 1:
  the per-tile t/dists windows ARE the block);
- NO matrix→rows t relayout: t arrives in ROWS layout (R·S, 1) straight
  from XLA (a reshape of the padded t matrix — free in HBM);
- NO per-row pts build on (rows, 3) vregs and NO bf16 x·Wx matmul: the
  posenc phases and the x-kernel path are LINEAR in t, so their per-ray
  parts hoist to XLA like the view branch does —
      P(row)    = [tile(o)·fmat + phase] + [tile(d)·fmat]·t      (rows, 6L)
      accx(row) = [o@Wx + b0]           + [d@Wx]·t               (rows, W)
  leaving one fma per posenc/trunk lane where the generic body pays
  repeat + mul + add + (rows,3) pts math + a K=3 matmul.

Precision: the phase fma runs in f32 (bf16 phases are garbage at 2^{L-1}
scaling — posenc_mlp_pallas._mm_f32 rationale); the hoisted o@Wx/d@Wx stay
f32 (MORE precise than the generic body's bf16 x_bf@Wx); the exclusive
log-T prefix keeps precision=HIGHEST (the −1.6 dB bf16 lesson, r3).
Association differs from the generic path ((o + d·t)·f vs o·f + (d·f)·t,
~1 ulp amplified 2^{L-1} by posenc) — cross-path agreement is test-bounded
like the existing carry-vs-two-stage tolerance.

Reference@v1 ships no code (/root/reference/README.md:1-2); the proposal
pattern is mip-NeRF-360's (PAPERS.md), the kernel is a Mosaic design driven
by the r4 per-program measurements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashion_nerf.kernels.posenc_mlp_pallas import (
    _INTERLEAVE, _TILE, _freq_row, _mm, _mm_trunk, _phase_offset,
    pack_params)

_LOG_FLOOR = -23.025851   # log(1e-10): mirrors core.volrend's cumprod clamp


def pack_sigma(params, mcfg):
    """→ (Wx (3,W) f32, b0 (1,W) f32, kernel_arrs, n_plain).

    kernel_arrs = (Wsc bf16, [W_plain bf16, b_plain]*, head_k bf16, head_b):
    everything the kernel consumes; Wx/b0 are returned separately because
    their per-ray products hoist to XLA (module docstring)."""
    arrs, plan, _dir_k, _cond_k = pack_params(params, mcfg)
    assert plan[0] == "first" and plan[-1] == "heads_plain" \
        and all(t == "plain" for t in plan[1:-1]), \
        f"sigma march requires an unconditioned no-skip σ-only plan: {plan}"
    Wx = arrs[0].astype(jnp.float32)
    b0 = arrs[2].astype(jnp.float32)
    kernel_arrs = (arrs[1],) + tuple(arrs[3:])
    return Wx, b0, kernel_arrs, len(plan) - 2


def hoist_rays(Wx, b0, rays_o, rays_d, L):
    """Per-ray linear-in-t parts of the first layer, computed ONCE per ray
    in XLA (the dirpart-hoist pattern): oF/dF (R, 6L) f32 phase intercept
    (offset folded) / slope; oWx/dWx (R, W) f32 trunk-x intercept (bias
    folded) / slope."""
    fmat = jnp.asarray(_freq_row(max(L, 1)))
    off = jnp.asarray(_phase_offset(max(L, 1)))
    oF = jnp.tile(rays_o, (1, 2 * L)) * fmat + off
    dF = jnp.tile(rays_d, (1, 2 * L)) * fmat
    hp = jax.lax.Precision.HIGHEST     # (R,3)@(3,W): trivial, keep exact
    oWx = jnp.dot(rays_o, Wx, precision=hp) + b0
    dWx = jnp.dot(rays_d, Wx, precision=hp)
    return oF, dF, oWx, dWx


def _sigma_kernel(n_plain, SB, rpt, softplus, il, alive_ref, oWx_ref,
                  dWx_ref, oF_ref, dF_ref, trow_ref, dmat_ref, ut_ref,
                  *refs):
    *w_refs, w_ref, acc_ref, logT_ref = refs
    ws = [r[:] for r in w_refs]
    ut = ut_ref[:]
    rH = rpt // il
    rows = rH * SB
    bf = jnp.bfloat16
    alive = jnp.max(alive_ref[:])

    def _expand(v):
        return jnp.broadcast_to(
            v[:, None, :], (v.shape[0], SB, v.shape[-1])
        ).reshape(v.shape[0] * SB, v.shape[-1])

    @pl.when(alive > 0.0)
    def _run():
        for j in range(il):
            rsl = pl.ds(j * rH, rH)
            trs = trow_ref[pl.ds(j * rows, rows), :]       # (rows, 1) f32
            # f32 phase fma (bf16 would wreck the top posenc band)
            P = _expand(oF_ref[rsl, :]) + _expand(dF_ref[rsl, :]) * trs
            SnCs = jnp.sin(P).astype(bf)                   # [sin | cos]
            accx = _expand(oWx_ref[rsl, :]) + _expand(dWx_ref[rsl, :]) * trs
            it = iter(ws)
            Wsc = next(it)
            h = jnp.maximum(accx + _mm_trunk(SnCs, Wsc), 0.0).astype(bf)
            for _ in range(n_plain):
                Wk, bk = next(it), next(it)
                h = jnp.maximum(_mm_trunk(h, Wk) + bk, 0.0).astype(bf)
            head_k, head_b = next(it), next(it)
            sig = (_mm(h, head_k) + head_b)[:, 3:4]        # σ lane of the
            dens = (jax.nn.softplus(sig) if softplus      # padded out head
                    else jnp.maximum(sig, 0.0))
            dens_m = dens.reshape(rH, SB)
            x = dens_m * dmat_ref[rsl, :]
            log_om = jnp.maximum(-x, _LOG_FLOOR)
            # exclusive log-T prefix via strict-upper ones matmul; HIGHEST:
            # log_om reaches −23·SB, a bf16-pass product shifts exp(logT)
            csum_ex = jnp.dot(log_om, ut,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            w = (1.0 - jnp.exp(-x)) * jnp.exp(csum_ex)
            w_ref[rsl, :] = w
            acc_ref[rsl, :] = jnp.sum(w, axis=1, keepdims=True)
            logT_ref[rsl, :] = jnp.sum(log_om, axis=1, keepdims=True)

    @pl.when(alive <= 0.0)
    def _dead():
        # unwritten VMEM is NaN canaries in interpret / garbage on hardware
        w_ref[:] = jnp.zeros_like(w_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        logT_ref[:] = jnp.zeros_like(logT_ref)


@functools.partial(
    jax.jit, static_argnames=("n_plain", "SB", "softplus", "interpret"))
def _sigma_march_eval(kernel_arrs, oWx, dWx, oF, dF, alive, t_rows, d_mat,
                      n_plain, SB, softplus, interpret=False):
    """σ-only single-block march over (R, SB) samples.

    alive (R, 1) f32: hit ∧ block-interval flags, folded in XLA. t_rows
    (R·SB, 1) f32 ray-major sample positions; d_mat (R, SB) scaled interval
    widths (zero-width pad sentinels). Returns (w (R, SB), acc (R,),
    logT (R,))."""
    R, S_pad = d_mat.shape
    assert S_pad == SB, (S_pad, SB)
    assert t_rows.shape == (R * SB, 1), (t_rows.shape, R, SB)
    rpt = _TILE // SB
    assert R % rpt == 0, (R, rpt)
    assert rpt % _INTERLEAVE == 0, (rpt, _INTERLEAVE)
    n_tiles = R // rpt
    ut = jnp.asarray(np.triu(np.ones((SB, SB), np.float32), 1))

    kernel = functools.partial(_sigma_kernel, n_plain, SB, rpt, softplus,
                               _INTERLEAVE)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    def _per_tile(width):
        return pl.BlockSpec((rpt, width), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        _per_tile(1),                                  # alive
        _per_tile(oWx.shape[1]),                       # oWx
        _per_tile(dWx.shape[1]),                       # dWx
        _per_tile(oF.shape[1]),                        # oF
        _per_tile(dF.shape[1]),                        # dF
        pl.BlockSpec((rpt * SB, 1), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),         # t rows
        _per_tile(SB),                                 # dists matrix
        _const2d(ut),
    ] + [_const2d(a) for a in kernel_arrs]

    W = oWx.shape[1]
    L2 = oF.shape[1] // 6
    flops_row = 2 * (6 * L2 * 3 * W + n_plain * W * W + W * 128)
    w, acc, logT = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(_per_tile(SB), _per_tile(1), _per_tile(1)),
        out_shape=(
            jax.ShapeDtypeStruct((R, SB), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(R * SB * flops_row),
            bytes_accessed=int(R * SB * 12),
            transcendentals=int(R * SB * 6 * L2),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(alive, oWx, dWx, oF, dF, t_rows, d_mat, ut, *kernel_arrs)
    return w, acc[:, 0], logT[:, 0]
