"""TPU-native substrate #3 (SURVEY.md §2.1): fused posenc + NeRF-MLP field.

BASELINE.json:5 — "sinusoidal positional encoding, and coarse/fine MLP
evaluation fuse into Pallas kernels that keep per-ray sample batches
resident". One pallas_call evaluates the whole field for a tile of samples.

Key layout decision: positional encoding is NOT materialized as a 63-wide
concat (cross-lane concats of 3-lane pieces are murder on the VPU). Instead:

    P  = x @ F          (MXU, F[:,3k:3k+3] = 2^k·I₃  →  (T, 3L) phases, f32)
    Sn = sin(P), Cs = cos(P)                          (one VPU op each)
    h₀ = x@Wx + Sn@Ws + Cs@Wc + b                     (three bf16 matmuls)

where Wx/Ws/Wc are row-gathers of the trained (63,256) kernel matching
core.posenc's [x, sin_k, cos_k]-interleaved layout. The skip layer and the
view-dir branch use the same split — the kernel contains zero concatenates.
Activations stay in VMEM across all 8 trunk layers (the XLA path writes
~126 GB of HBM activations per 800×800 fine pass; here that traffic is zero).

Training gradients: custom VJP recomputes through the XLA field (same math,
autodiff-friendly), so one field interface serves train and render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fashion_nerf.config import Config, ModelConfig
from fashion_nerf.core.posenc import posenc

_TILE = 2048  # rows/program: f32 (T,256) accumulators dominate the 16MB VMEM


# --------------------------------------------------------------------------
# packing: flax param tree → flat arrays + a static consumption plan
# --------------------------------------------------------------------------

def _freq_matrix(L: int, d: int = 3) -> np.ndarray:
    """F (d, d·L) with F[:, d·k : d·(k+1)] = 2^k · I_d."""
    F = np.zeros((d, d * L), np.float32)
    for k in range(L):
        F[:, d * k:d * (k + 1)] = (2.0 ** k) * np.eye(d, dtype=np.float32)
    return F


def _split_posenc_kernel(k, L: int, d: int = 3):
    """Rows of a ((1+2L)d, n) kernel → (Wx (d,n), Ws (dL,n), Wc (dL,n))
    matching core.posenc's [x, sin_k(d), cos_k(d)]-per-frequency layout."""
    Wx = k[:d]
    Ws = jnp.concatenate([k[d + 2 * d * i: 2 * d + 2 * d * i]
                          for i in range(L)], axis=0)
    Wc = jnp.concatenate([k[2 * d + 2 * d * i: 3 * d + 2 * d * i]
                          for i in range(L)], axis=0)
    return Wx, Ws, Wc


def pack_params(params, mcfg: ModelConfig):
    """→ (arrs: list of jnp arrays, plan: static tuple of op tags).

    plan entries: ("first",) ("skip",) ("plain",) per trunk layer, then
    ("heads_vd",) or ("heads_plain",).
    """
    p = params["params"]
    L = mcfg.posenc_xyz
    cx = 3 * (2 * L + 1)
    bf = jnp.bfloat16
    arrs, plan = [], []

    def put_b(b):
        arrs.append(b.astype(jnp.float32).reshape(1, -1))

    for i in range(mcfg.net_depth):
        k = p[f"trunk_{i}"]["kernel"]
        b = p[f"trunk_{i}"]["bias"]
        if i == 0:
            Wx, Ws, Wc = _split_posenc_kernel(k, L)
            arrs += [Wx.astype(bf), Ws.astype(bf), Wc.astype(bf)]
            put_b(b)
            plan.append("first")
        elif k.shape[0] > mcfg.net_width:          # post-skip: h-part + γ(x)
            Wh = k[cx:]
            Wx, Ws, Wc = _split_posenc_kernel(k[:cx], L)
            arrs += [Wh.astype(bf), Wx.astype(bf), Ws.astype(bf),
                     Wc.astype(bf)]
            put_b(b)
            plan.append("skip")
        else:
            arrs.append(k.astype(bf))
            put_b(b)
            plan.append("plain")

    if mcfg.use_viewdirs:
        Ld = mcfg.posenc_dir
        arrs.append(p["sigma_head"]["kernel"].astype(bf))
        put_b(p["sigma_head"]["bias"])
        arrs.append(p["feature"]["kernel"].astype(bf))
        put_b(p["feature"]["bias"])
        kv = p["view_0"]["kernel"]
        W = mcfg.net_width
        Wf = kv[:W]
        Wdx, Wds, Wdc = _split_posenc_kernel(kv[W:], Ld)
        arrs += [Wf.astype(bf), Wdx.astype(bf), Wds.astype(bf),
                 Wdc.astype(bf)]
        put_b(p["view_0"]["bias"])
        arrs.append(p["rgb_head"]["kernel"].astype(bf))
        put_b(p["rgb_head"]["bias"])
        plan.append("heads_vd")
    else:
        arrs.append(p["out_head"]["kernel"].astype(bf))
        put_b(p["out_head"]["bias"])
        plan.append("heads_plain")

    return arrs, tuple(plan)


# --------------------------------------------------------------------------
# kernel body
# --------------------------------------------------------------------------

def _mm(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _mm_f32(a, w):
    # full-f32 matmul: the PHASE computation must not round positions to
    # bf16 — at the top band the 2^(L-1) scaling turns a bf16 position
    # quantum (~4e-3 relative) into ~2 radians of phase error
    return jnp.dot(a, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


_INTERLEAVE = 2  # independent row-halves per tile so Mosaic can overlap the
                 # MXU matmul of one half with the VPU relu/cast of the other
                 # (a single dependent chain leaves the MXU idle every layer)


def _field_kernel(plan, L, Ld, pts_ref, dirs_ref, fmat_ref, fdmat_ref,
                  *refs):
    *w_refs, rgb_ref, sigma_ref = refs
    bf = jnp.bfloat16
    ws = [r[:] for r in w_refs]
    T = pts_ref.shape[0]
    half = T // _INTERLEAVE

    def run_half(x, d):
        it = iter(ws)
        P = _mm_f32(x, fmat_ref[:])      # f32 phases (bf16 sin(2^9·x) would
        Sn = jnp.sin(P).astype(bf)       # be garbage)
        Cs = jnp.cos(P).astype(bf)
        x_bf = x.astype(bf)

        h = None
        for tag in plan[:-1]:
            if tag == "first":
                Wx, Ws, Wc = next(it), next(it), next(it)
                b = next(it)
                acc = _mm(x_bf, Wx) + _mm(Sn, Ws) + _mm(Cs, Wc)
            elif tag == "skip":
                Wh = next(it)
                Wx, Ws, Wc = next(it), next(it), next(it)
                b = next(it)
                acc = (_mm(h, Wh) + _mm(x_bf, Wx) + _mm(Sn, Ws)
                       + _mm(Cs, Wc))
            else:
                Wh = next(it)
                b = next(it)
                acc = _mm(h, Wh)
            h = jnp.maximum(acc + b, 0.0).astype(bf)

        if plan[-1] == "heads_vd":
            w_sig, b_sig = next(it), next(it)
            w_feat, b_feat = next(it), next(it)
            Wf, Wdx, Wds, Wdc = (next(it), next(it), next(it), next(it))
            b_v = next(it)
            w_rgb, b_rgb = next(it), next(it)

            sigma = _mm(h, w_sig) + b_sig                    # (T, 1)
            feat = (_mm(h, w_feat) + b_feat).astype(bf)
            Pd = _mm_f32(d, fdmat_ref[:])                    # (T, 3Ld)
            h2 = (_mm(feat, Wf) + _mm(d.astype(bf), Wdx)
                  + _mm(jnp.sin(Pd).astype(bf), Wds)
                  + _mm(jnp.cos(Pd).astype(bf), Wdc) + b_v)
            h2 = jnp.maximum(h2, 0.0).astype(bf)
            rgb = jax.nn.sigmoid(_mm(h2, w_rgb) + b_rgb)
        else:
            w_o, b_o = next(it), next(it)
            raw = _mm(h, w_o) + b_o                          # (T, 4)
            rgb = jax.nn.sigmoid(raw[:, :3])
            sigma = raw[:, 3:4]
        return rgb, sigma

    for j in range(_INTERLEAVE):
        sl = pl.ds(j * half, half)
        rgb, sigma = run_half(pts_ref[sl, :], dirs_ref[sl, :])
        rgb_ref[sl, :] = rgb
        sigma_ref[sl, :] = sigma


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("plan", "L", "Ld", "interpret"))
def _fused_eval(weight_arrs, pts_flat, dirs_flat, plan, L, Ld,
                interpret=False):
    n = pts_flat.shape[0]
    tile = min(_TILE, n)
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)

    fmat = jnp.asarray(_freq_matrix(max(L, 1)))
    fdmat = jnp.asarray(_freq_matrix(max(Ld, 1)))

    kernel = functools.partial(_field_kernel, plan, L, Ld)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const2d(fmat),
        _const2d(fdmat),
    ] + [_const2d(a) for a in weight_arrs]

    cx = 3 * (2 * L + 1)
    flops_row = 2 * 0.53e6  # ~per-sample MLP FLOPs, close enough for sched
    rgb, sigma = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n * flops_row),
            bytes_accessed=int(n * (3 + 3 + 4) * 4),
            transcendentals=int(n * (6 * L + 6 * Ld + 3)),
        ),
        interpret=interpret,
    )(pts_flat, dirs_flat, fmat, fdmat, *weight_arrs)
    return rgb, sigma


def make_fused_field(cfg: Config):
    """Field fn with the models/ convention:
    field(params, pts (R,S,3), viewdirs (R,3), cond) → (rgb, sigma).

    Conditioned inputs fall back to the XLA field (fused conditioning lands
    with the try-on phase); gradients flow via custom VJP (XLA recompute).
    """
    mcfg = cfg.model
    interpret = cfg.kernels.interpret
    from fashion_nerf.models.nerf_mlp import make_field
    _, xla_field = make_field(mcfg)

    @jax.custom_vjp
    def field_core(params, pts, viewdirs):
        return _fused_forward(params, pts, viewdirs)

    def _fused_forward(params, pts, viewdirs):
        R, S = pts.shape[0], pts.shape[1]
        n = R * S
        tile = min(_TILE, n)
        pad = (-n) % tile
        pts_flat = pts.reshape(n, 3)
        d_unit = viewdirs / jnp.linalg.norm(viewdirs, axis=-1,
                                            keepdims=True)
        dirs_flat = jnp.broadcast_to(d_unit[:, None, :],
                                     (R, S, 3)).reshape(n, 3)
        if pad:
            pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
            dirs_flat = jnp.pad(dirs_flat, ((0, pad), (0, 0)))
        arrs, plan = pack_params(params, mcfg)
        rgb, sigma = _fused_eval(tuple(arrs), pts_flat, dirs_flat, plan,
                                 mcfg.posenc_xyz, mcfg.posenc_dir,
                                 interpret)
        rgb = rgb[:n].reshape(R, S, 3)
        sigma = sigma[:n, 0].reshape(R, S)
        return rgb, sigma

    def _fwd(params, pts, viewdirs):
        out = _fused_forward(params, pts, viewdirs)
        return out, (params, pts, viewdirs)

    def _bwd(res, g):
        params, pts, viewdirs = res
        _, vjp = jax.vjp(lambda p, x, d: xla_field(p, x, d, None),
                         params, pts, viewdirs)
        return vjp(g)

    field_core.defvjp(_fwd, _bwd)

    def field(params, pts, viewdirs=None, cond=None):
        if cond is not None:
            return xla_field(params, pts, viewdirs, cond)
        if viewdirs is None:
            if mcfg.use_viewdirs:
                raise ValueError("use_viewdirs=True requires viewdirs")
            viewdirs = jnp.ones((pts.shape[0], 3), jnp.float32)
        return field_core(params, pts, viewdirs)

    return field
