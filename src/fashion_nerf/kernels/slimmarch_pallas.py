"""Slim carry march: the generic carry-march body (blockmarch_pallas) with
every per-row linear-in-t cost hoisted to XLA — the sigmamarch decomposition
generalized to rgb-compositing, multi-block, early-terminating marches
(VERDICT r4 next #1).

Why: the r4 per-program anatomy priced the FINE carry march at 42.5 µs/
program alive vs the plain two-stage field kernel's 29.2 µs ≈ the ~27 µs MXU
floor (BASELINE.md r4) — ~30% of the frame's dominant component is per-row
VPU/selector/relayout overhead of exactly the class the slim σ-march removed
from the proposal pass. This kernel keeps what an rgb-compositing march
needs (the in-VMEM transmittance carry, per-(tile, block) predication, the
dirpart expand, in-kernel rgb compositing) and removes the rest:

- NO selector gather/scatter matmuls: t arrives in ROWS layout and dists/
  weights in BLOCK-MAJOR matrix layout — (NB·R, SB) arrays whose (rpt, SB)
  windows are FULL-WIDTH (the Mosaic lane rule that rejected per-block
  windows of an (R, S_pad) array is satisfied by re-laying the array out in
  XLA, where the transpose is ~free HBM traffic). The generic kernel paid
  three HIGHEST-precision selector matmuls per (tile, block): t gather,
  dists gather, weights scatter.
- NO matrix→rows t relayout (the (rows, SB) iota-mask select + reduce):
  t comes block-major rows-layout (NB·R·SB, 1) straight from XLA.
- NO per-row pts build on (rows, 3) vregs and NO x@Wx matmuls: the posenc
  phases and every x-consuming trunk layer (first + skips) are LINEAR in t,
  so their per-ray parts hoist to XLA (the sigmamarch pattern):
      P(row)     = [tile(o)·fmat + phase] + [tile(d)·fmat]·t     (rows, 6L)
      accx_i(row)= [o@Wx_i + b_i (+cond_i)] + [d@Wx_i]·t         (rows, W)
  Conditioning folds into the intercept (cond rows attach to exactly the
  x-consuming layers and their per-ray product is t-independent), so the
  conditioned march needs NO condpart window at all.
- NO depth/acc compositing or output windows: depth = Σw·t and acc = Σw are
  cheap XLA reductions over the weights output the march already produces.

Precision: phase fma f32 (posenc_mlp_pallas._mm_f32 rationale); hoisted
o@Wx/d@Wx f32 HIGHEST (MORE precise than the generic bf16 x@Wx — association
differs by ~1 ulp amplified 2^{L-1} by posenc, bounded by the cross-path
equivalence tests); exclusive log-T prefix at HIGHEST (the −1.6 dB bf16
lesson, r3).

Reference@v1 ships no renderer (/root/reference/README.md:1-2); the design
is driven by the r4 per-program measurements (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashion_nerf.kernels.posenc_mlp_pallas import (
    _INTERLEAVE, _TILE, _freq_row, _mm, _mm_trunk, _phase_offset)

_LOG_FLOOR = -23.025851   # log(1e-10): mirrors core.volrend's cumprod clamp


def split_hoist(packed):
    """make_block_evaluator.pack output → (kernel_arrs, x_kernels).

    x_kernels = ((Wx (3, W) f32, b (1, W) f32), …) per x-consuming layer
    (first + each skip) in plan order — these LEAVE the kernel: their
    per-ray products are linear in t and hoist to XLA (hoist_rays); the
    bias rides in the intercept. kernel_arrs keeps everything else in the
    generic packing order minus the extracted Wx/b."""
    arrs, plan = packed[0], packed[1]
    it = iter(arrs)
    kernel_arrs, x_kernels = [], []
    for tag in plan[:-1]:
        base = tag[:-2] if tag.endswith("_c") else tag
        if base == "first":
            Wx, Wsc, b = next(it), next(it), next(it)
            x_kernels.append((Wx.astype(jnp.float32),
                              b.astype(jnp.float32)))
            kernel_arrs.append(Wsc)
        elif base == "skip":
            Wh, Wx, Wsc, b = next(it), next(it), next(it), next(it)
            x_kernels.append((Wx.astype(jnp.float32),
                              b.astype(jnp.float32)))
            kernel_arrs += [Wh, Wsc]
        else:
            kernel_arrs += [next(it), next(it)]
    kernel_arrs += list(it)                      # heads, unchanged
    return tuple(kernel_arrs), tuple(x_kernels)


def hoist_rays(x_kernels, L, rays_o, rays_d, condpart=None):
    """Per-ray linear-in-t parts, once per (chunk, pass) in XLA:
    oF/dF (R, 6L) f32 phase intercept (offset folded) / slope;
    oX/dX (R, n_x·W) f32 trunk-x intercepts (bias + cond folded) / slopes,
    x-layer i in columns [i·W, (i+1)·W)."""
    fmat = jnp.asarray(_freq_row(max(L, 1)))
    off = jnp.asarray(_phase_offset(max(L, 1)))
    oF = jnp.tile(rays_o, (1, 2 * L)) * fmat + off
    dF = jnp.tile(rays_d, (1, 2 * L)) * fmat
    hp = jax.lax.Precision.HIGHEST     # (R,3)@(3,W): trivial, keep exact
    oXs, dXs = [], []
    for i, (Wx, b) in enumerate(x_kernels):
        W = Wx.shape[1]
        o = jnp.dot(rays_o, Wx, precision=hp) + b
        if condpart is not None:
            # cond rows attach to exactly the x-consuming layers
            # (pack_params) and act on per-ray data — fold into the
            # intercept instead of paying a condpart window + expand
            o = o + condpart[:, i * W:(i + 1) * W].astype(jnp.float32)
        oXs.append(o)
        dXs.append(jnp.dot(rays_d, Wx, precision=hp))
    return oF, dF, jnp.concatenate(oXs, 1), jnp.concatenate(dXs, 1)


def _slim_kernel(plan, W, SB, rpt, NB, log_eps, softplus, il, has_vd,
                 hit_ref, bhit_ref, oX_ref, dX_ref, oF_ref, dF_ref, *refs):
    if has_vd:
        dirpart_ref, *refs = refs
    trow_ref, dmat_ref, ut_ref, *refs = refs
    n_w = len(refs) - 3
    w_refs = refs[:n_w]
    rgb_ref, w_ref, logT_ref = refs[n_w:]
    ws = [r[:] for r in w_refs]
    ut = ut_ref[:]
    rH = rpt // il            # rays per interleave slice
    rows = rH * SB            # MLP rows per slice
    bf = jnp.bfloat16
    b = pl.program_id(1)

    # accumulator windows map to (t, 0): resident in VMEM across the tile's
    # sequential block programs, flushed once per tile
    @pl.when(b == 0)
    def _init():
        rgb_ref[:] = jnp.zeros_like(rgb_ref)
        logT_ref[:] = jnp.zeros_like(logT_ref)

    hit = hit_ref[:]                                   # (rpt, 1) f32
    bh_all = bhit_ref[:]
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, bh_all.shape, 1)
    bhit = jnp.max(jnp.where(lane_nb == b, bh_all, 0.0), axis=1,
                   keepdims=True)                      # (rpt, 1)
    logT_now = logT_ref[:]
    alive = jnp.max(jnp.where(
        (hit > 0.0) & (bhit > 0.0) & (logT_now > log_eps), 1.0, 0.0))

    def _expand(v):
        return jnp.broadcast_to(
            v[:, None, :], (v.shape[0], SB, v.shape[-1])
        ).reshape(v.shape[0] * SB, v.shape[-1])

    @pl.when(alive > 0.0)
    def _block():
        for j in range(il):
            rsl = pl.ds(j * rH, rH)                    # ray slice
            trs = trow_ref[pl.ds(j * rows, rows), :]   # (rows, 1) f32
            # f32 phase fma (bf16 would wreck the top posenc band)
            P = _expand(oF_ref[rsl, :]) + _expand(dF_ref[rsl, :]) * trs
            SnCs = jnp.sin(P).astype(bf)               # [sin | cos]
            it = iter(ws)
            xi = 0
            h = None
            for tag in plan[:-1]:
                base = tag[:-2] if tag.endswith("_c") else tag
                xsl = pl.ds(xi * W, W)
                if base == "first":
                    Wsc = next(it)
                    acc = (_expand(oX_ref[rsl, xsl])
                           + _expand(dX_ref[rsl, xsl]) * trs
                           + _mm_trunk(SnCs, Wsc))
                    xi += 1
                elif base == "skip":
                    Wh, Wsc = next(it), next(it)
                    acc = (_mm_trunk(h, Wh) + _mm_trunk(SnCs, Wsc)
                           + _expand(oX_ref[rsl, xsl])
                           + _expand(dX_ref[rsl, xsl]) * trs)
                    xi += 1
                else:
                    Wh, bk = next(it), next(it)
                    acc = _mm_trunk(h, Wh) + bk
                h = jnp.maximum(acc, 0.0).astype(bf)

            # heads: same math as posenc_mlp_pallas.mlp_rows
            if plan[-1] == "heads_vd":
                w_sig, b_sig = next(it), next(it)
                w_feat, b_feat = next(it), next(it)
                Wf, b_v = next(it), next(it)
                w_rgb, b_rgb = next(it), next(it)
                sigma = (_mm(h, w_sig) + b_sig)[:, :1]
                feat = (_mm(h, w_feat) + b_feat).astype(bf)
                h2 = _mm(feat, Wf) \
                    + _expand(dirpart_ref[rsl, :]).astype(jnp.float32) + b_v
                h2 = jnp.maximum(h2, 0.0).astype(bf)
                rgb = jax.nn.sigmoid((_mm(h2, w_rgb) + b_rgb)[:, :3])
            else:
                w_o, b_o = next(it), next(it)
                raw = _mm(h, w_o) + b_o                # padded (rows, 128)
                rgb = jax.nn.sigmoid(raw[:, :3])
                sigma = raw[:, 3:4]

            dens = (jax.nn.softplus(sigma) if softplus
                    else jnp.maximum(sigma, 0.0))
            dens_m = dens.reshape(rH, SB)              # rows→matrix relayout
            x = dens_m * dmat_ref[rsl, :]              # direct: block-major
            log_om = jnp.maximum(-x, _LOG_FLOOR)
            # HIGHEST: log_om reaches −23·SB; a bf16-pass product rounds
            # the exclusive prefix enough to shift exp(logT) visibly
            csum_ex = jnp.dot(log_om, ut,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            logT_j = logT_ref[rsl, :]
            wgt = (1.0 - jnp.exp(-x)) * jnp.exp(logT_j + csum_ex)
            w_ref[rsl, :] = wgt                        # direct: block-major
            parts = [jnp.sum(wgt * rgb[:, c:c + 1].reshape(rH, SB),
                             axis=1, keepdims=True) for c in range(3)]
            rgb_ref[rsl, :] += jnp.concatenate(parts, axis=1)
            logT_ref[rsl, :] = logT_j + jnp.sum(log_om, axis=1,
                                                keepdims=True)

    @pl.when(alive <= 0.0)
    def _dead():
        # the w window is per-(tile, block): unwritten VMEM is NaN canaries
        # in interpret / garbage on hardware
        w_ref[:] = jnp.zeros_like(w_ref)


@functools.partial(
    jax.jit, static_argnames=("plan", "SB", "softplus", "log_eps",
                              "interpret"))
def _slim_eval(kernel_arrs, oX, dX, oF, dF, dirpart, hit, block_hit, t_bm,
               d_bm, plan, SB, softplus, log_eps, interpret=False):
    """One slim-marched pass over (R, NB·SB) samples, carry in VMEM.

    t_bm (NB·R·SB, 1) f32 BLOCK-MAJOR rows-layout sample positions
    (reshape/transpose of the padded t matrix — free in HBM); d_bm
    (NB·R, SB) block-major scaled interval widths (zero-width pad
    sentinels). hit (R, 1) f32 AABB-hit flags; block_hit (R, NB) f32
    macro-box flags. dirpart (R, 128) bf16 per-ray view rows (heads_vd
    plans only; pass None otherwise).
    Returns (rgb (R, 3), w (NB·R, SB) block-major, logT (R,))."""
    R = hit.shape[0]
    NBR, SB2 = d_bm.shape
    assert SB2 == SB, (d_bm.shape, SB)
    assert NBR % R == 0, (NBR, R)
    NB = NBR // R
    assert t_bm.shape == (NB * R * SB, 1), (t_bm.shape, R, NB, SB)
    assert block_hit.shape == (R, NB), (block_hit.shape, R, NB)
    has_vd = plan[-1] == "heads_vd"
    assert (dirpart is not None) == has_vd
    n_x = sum(1 for t in plan
              if (t[:-2] if t.endswith("_c") else t) in ("first", "skip"))
    W = oX.shape[1] // n_x
    # same tile rule as the generic march (R-divisibility contract with the
    # caller) even though the slim kernel carries no condpart window
    has_cond = any(t.endswith("_c") for t in plan)
    rpt = (_TILE // 2 if has_cond else _TILE) // SB
    assert R % rpt == 0, (R, rpt)
    assert rpt % _INTERLEAVE == 0, (rpt, _INTERLEAVE)
    n_tiles = R // rpt
    ut = jnp.asarray(np.triu(np.ones((SB, SB), np.float32), 1))

    kernel = functools.partial(
        _slim_kernel, plan, W, SB, rpt, NB, float(log_eps), softplus,
        _INTERLEAVE, has_vd)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda t, b: (0, 0),
                            memory_space=pltpu.VMEM)

    def _per_tile(width):
        # loaded once per tile, revisited across its block programs
        return pl.BlockSpec((rpt, width), lambda t, b: (t, 0),
                            memory_space=pltpu.VMEM)

    def _per_block(rows, width):
        # block-major per-(tile, block) windows: full-width by construction
        return pl.BlockSpec((rows, width), lambda t, b: (b * n_tiles + t, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        _per_tile(1),                                  # hit
        _per_tile(NB),                                 # block_hit
        _per_tile(oX.shape[1]),                        # oX
        _per_tile(dX.shape[1]),                        # dX
        _per_tile(oF.shape[1]),                        # oF
        _per_tile(dF.shape[1]),                        # dF
    ] + ([_per_tile(dirpart.shape[1])] if has_vd else []) + [
        _per_block(rpt * SB, 1),                       # t rows, block-major
        _per_block(rpt, SB),                           # dists, block-major
        _const2d(ut),
    ] + [_const2d(a) for a in kernel_arrs]

    out_specs = (_per_tile(3),                         # rgb (revisited)
                 _per_block(rpt, SB),                  # weights, block-major
                 _per_tile(1))                         # logT (revisited)
    out_shape = (
        jax.ShapeDtypeStruct((R, 3), jnp.float32),
        jax.ShapeDtypeStruct((NB * R, SB), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
    )

    L2 = oF.shape[1] // 6
    n_plain = sum(1 for t in plan[:-1]
                  if (t[:-2] if t.endswith("_c") else t) == "plain")
    flops_row = 2 * (6 * L2 * W + (n_plain + n_x) * W * W + W * 3 * 128)
    dir_inputs = (dirpart,) if has_vd else ()
    rgb, w, logT = pl.pallas_call(
        kernel,
        grid=(n_tiles, NB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(R * NB * SB * flops_row),
            bytes_accessed=int(R * NB * SB * 12),
            transcendentals=int(R * NB * SB * (6 * L2 + 3)),
        ),
        # tiles independent (parallel); a tile's block programs carry the
        # transmittance through revisited VMEM windows → blocks sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(hit, block_hit, oX, dX, oF, dF, *dir_inputs, t_bm, d_bm, ut,
      *kernel_arrs)
    return rgb, w, logT[:, 0]
