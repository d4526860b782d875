"""TPU-native substrate #3 (SURVEY.md §2.1): fused posenc + NeRF-MLP field.

BASELINE.json:5 — "sinusoidal positional encoding, and coarse/fine MLP
evaluation fuse into Pallas kernels that keep per-ray sample batches
resident". One pallas_call evaluates the whole field for a tile of samples.

Layout decisions (each measured on v5e):

1. γ(x) is never materialized as a 63-wide concat (cross-lane concats of
   3-lane pieces are murder on the VPU). Phases are pure VPU:
       P    = pltpu.repeat(x, 2L) · freq_row + [0|π/2]   (f32)
       SnCs = sin(P)                                      (ONE transcendental
                                                           pass; cos folded
                                                           via the π/2 half)
       h₀   = x@Wx + SnCs@Wsc + b                         (bf16 MXU)
   with Wx/Wsc row-gathers of the trained (63,256) kernel matching
   core.posenc's layout. Skip layers reuse the same split — zero concats.
2. The view branch's direction term is PER-RAY: γ(d)@W_dir is hoisted to an
   XLA precompute and enters the kernel as an expanded bf16 (T,128) input
   (in-kernel per-sample dir work was 64×-redundant, ~20% of kernel time).
3. Head matmuls are padded to 128 lanes (N=1/3 Mosaic matmuls are slow).
4. Phases stay f32 — bf16 positions lose ~2 rad at the top band (2^{L-1}).

Activations stay in VMEM across all 8 trunk layers (the XLA path streams
~GBs of HBM activations per 800×800 fine pass; here that traffic is zero).

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

_TILE = 2048  # rows/program: f32 (T,256) accumulators dominate the 16 MB
              # VMEM budget; fits since the dir branch was hoisted out
              # (3072 OOMs; 2048 renders 4% faster than 1536)


# --------------------------------------------------------------------------
# packing: flax param tree → flat arrays + a static consumption plan
# --------------------------------------------------------------------------

def _freq_row(L: int, d: int = 3) -> np.ndarray:
    """(1, 2·d·L) band multipliers for the block-repeated position layout
    pltpu.repeat(x, 2L) = [x(d)·2L blocks]: block b carries 2^(b mod L);
    cos x = sin(x + π/2), so blocks b ≥ L get the offset instead of a second
    transcendental pass. Phases become pure VPU ops — an f32 HIGHEST matmul
    here carried a fixed Mosaic slow-path cost per call."""
    row = np.zeros((1, 2 * d * L), np.float32)
    for b in range(2 * L):
        row[:, d * b:d * (b + 1)] = 2.0 ** (b % L)
    return row


def _phase_offset(L: int, d: int = 3) -> np.ndarray:
    """(1, 2·d·L): 0 on the sin half, π/2 on the cos half."""
    off = np.zeros((1, 2 * d * L), np.float32)
    off[:, d * L:] = np.pi / 2.0
    return off


def _split_posenc_kernel(k, L: int, d: int = 3):
    """Rows of a ((1+2L)d, n) kernel → (Wx (d,n), Wsc (2dL,n)) with Wsc
    stacked [sin rows; cos rows] to match the duplicated phase layout."""
    Wx = k[:d]
    Ws = jnp.concatenate([k[d + 2 * d * i: 2 * d + 2 * d * i]
                          for i in range(L)], axis=0)
    Wc = jnp.concatenate([k[2 * d + 2 * d * i: 3 * d + 2 * d * i]
                          for i in range(L)], axis=0)
    return Wx, jnp.concatenate([Ws, Wc], axis=0)


def pack_params(params, mcfg: ModelConfig):
    """→ (arrs, plan, dir_kernel, cond_kernel).

    plan entries: ("first",) ("skip",) ("plain",) per trunk layer — with a
    "_c" suffix on cond-consuming layers when the model is conditioned —
    then ("heads_vd",) or ("heads_plain",).

    Conditioning (BASELINE.json:10-11, VERDICT r2 #4): the XLA field concats
    cond (R,Cc) to the trunk input (models/nerf_mlp.py:44-46), so trunk_0 and
    every skip layer carry Cc extra kernel rows acting on PER-RAY data —
    exactly like the view branch. Those rows are hoisted out as cond_kernel
    (Cc, n_cond_layers·W); the XLA-side cond @ cond_kernel product enters
    the kernel as a per-ray operand expanded per sample in VMEM.
    """
    p = params["params"]
    L = mcfg.posenc_xyz
    cx = 3 * (2 * L + 1)
    W = mcfg.net_width
    bf = jnp.bfloat16
    k0 = p["trunk_0"]["kernel"]
    Cc = k0.shape[0] - cx                     # cond width baked into params
    arrs, plan, cond_blocks = [], [], []

    def put_b(b):
        arrs.append(jnp.asarray(b, jnp.float32).reshape(1, -1))

    for i in range(mcfg.net_depth):
        k = p[f"trunk_{i}"]["kernel"]
        b = p[f"trunk_{i}"]["bias"]
        if i == 0:
            Wx, Wsc = _split_posenc_kernel(k[:cx], L)
            arrs += [Wx.astype(bf), Wsc.astype(bf)]
            put_b(b)
            if Cc > 0:
                cond_blocks.append(k[cx:cx + Cc])
                plan.append("first_c")
            else:
                plan.append("first")
        elif k.shape[0] > W:                   # post-skip: trunk_in + h rows
            Wh = k[cx + Cc:]
            Wx, Wsc = _split_posenc_kernel(k[:cx], L)
            arrs += [Wh.astype(bf), Wx.astype(bf), Wsc.astype(bf)]
            put_b(b)
            if Cc > 0:
                cond_blocks.append(k[cx:cx + Cc])
                plan.append("skip_c")
            else:
                plan.append("skip")
        else:
            arrs.append(k.astype(bf))
            put_b(b)
            plan.append("plain")

    def pad_cols(a, n=128):
        # tiny-N matmuls (N=1/3/4) take slow Mosaic paths; pad to a full
        # 128-lane tile and slice the result in-kernel
        return jnp.pad(a, ((0, 0), (0, n - a.shape[1])))

    dir_kernel = None
    if mcfg.use_viewdirs:
        arrs.append(pad_cols(p["sigma_head"]["kernel"].astype(bf)))
        put_b(pad_cols(p["sigma_head"]["bias"].reshape(1, -1)))
        arrs.append(p["feature"]["kernel"].astype(bf))
        put_b(p["feature"]["bias"])
        kv = p["view_0"]["kernel"]
        W = mcfg.net_width
        # dir rows of view_0 act on PER-RAY data — hoisted to an XLA
        # precompute (γ(d) @ kv[W:] once per ray); the kernel adds the
        # expanded per-sample copy. In-kernel per-sample dir posenc cost
        # 9 ms per 2M rows (measured) for 64x-redundant work.
        dir_kernel = kv[W:]
        arrs.append(kv[:W].astype(bf))               # feat part only
        put_b(p["view_0"]["bias"])
        arrs.append(pad_cols(p["rgb_head"]["kernel"].astype(bf)))
        put_b(pad_cols(p["rgb_head"]["bias"].reshape(1, -1)))
        plan.append("heads_vd")
    else:
        arrs.append(pad_cols(p["out_head"]["kernel"].astype(bf)))
        put_b(pad_cols(p["out_head"]["bias"].reshape(1, -1)))
        plan.append("heads_plain")

    cond_kernel = (jnp.concatenate(cond_blocks, axis=1)
                   if cond_blocks else None)            # (Cc, n_cond·W) f32
    return arrs, tuple(plan), dir_kernel, cond_kernel


# --------------------------------------------------------------------------
# kernel body
# --------------------------------------------------------------------------

_ACCUM_DTYPE = "float32"   # trunk matmul output dtype. "bfloat16" is a dead
                           # end on this toolchain: Mosaic verifies
                           # 'tpu.matmul acc must be 32-bit' (the MXU pops
                           # f32), so the halve-output-traffic idea cannot
                           # be expressed. Module-level for kernel_bench
                           # sweeps; measured plateau 75-79 TFLOPs-equiv at
                           # tile 2048, interleave 4-8.


def _mm(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _mm_trunk(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.dtype(_ACCUM_DTYPE))


def _mm_f32(a, w):
    # full-f32 matmul: the PHASE computation must not round positions to
    # bf16 — at the top band the 2^(L-1) scaling turns a bf16 position
    # quantum (~4e-3 relative) into ~2 radians of phase error
    return jnp.dot(a, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


_INTERLEAVE = 4  # independent row-slices per tile so Mosaic can overlap the
                 # MXU matmul of one slice with the VPU relu/cast of the
                 # others (a single dependent chain leaves the MXU idle every
                 # layer). Swept on v5e (scripts/kernel_bench.py): il=4 at
                 # tile 2048 → 75.6 TFLOPs-equiv vs 56.5 at il=2; il=1 68.4;
                 # tile 4096 fails to compile, bf16 trunk accum trips a
                 # Mosaic verification error.


_DEAD_SIGMA = -1e10   # post-relu density 0 ⇒ α = 0 ⇒ zero weight downstream


def mlp_rows(plan, L, ws, fmat, off, x, d, c=None):
    """The fused posenc+MLP on a slab of rows, as pure VALUE math (shared by
    the forward kernel, the backward recompute, and the carry march).

    x (rows, 3) f32 positions; d (rows, dw) per-sample dir-branch rows;
    c (rows, n_cond·W) per-sample cond-branch rows (the hoisted
    cond @ cond_kernel product — W-wide slice i feeds cond layer i) when the
    plan carries "_c" tags.
    → (rgb (rows, 3) post-sigmoid f32, sigma (rows, 1) raw f32)."""
    bf = jnp.bfloat16
    it = iter(ws)
    # phases in f32 (bf16 sin(2^9·x) would be garbage); cos folded into
    # the same sin pass via the +π/2 offset half; block-repeat × freq
    # row keeps this pure-VPU
    P = pltpu.repeat(x, 2 * L, axis=1) * fmat + off
    SnCs = jnp.sin(P).astype(bf)     # (rows, 6L): [sin | cos]
    x_bf = x.astype(bf)

    W = None
    h = None
    ci = 0
    for tag in plan[:-1]:
        if tag in ("first", "first_c"):
            Wx, Wsc = next(it), next(it)
            b = next(it)
            W = Wx.shape[1]
            acc = _mm_trunk(x_bf, Wx) + _mm_trunk(SnCs, Wsc)
        elif tag in ("skip", "skip_c"):
            Wh = next(it)
            Wx, Wsc = next(it), next(it)
            b = next(it)
            acc = _mm_trunk(h, Wh) + _mm_trunk(x_bf, Wx) \
                + _mm_trunk(SnCs, Wsc)
        else:
            Wh = next(it)
            b = next(it)
            acc = _mm_trunk(h, Wh)
        if tag.endswith("_c"):
            acc = acc + c[:, ci * W:(ci + 1) * W].astype(acc.dtype)
            ci += 1
        acc = acc + b.astype(acc.dtype)
        if acc.dtype == jnp.bfloat16:
            # compare-free relu: v5e Mosaic rejects bf16 cmpf, so the
            # bf16-accumulate variant uses (x + |x|)/2
            h = ((acc + jnp.abs(acc)) * jnp.bfloat16(0.5)).astype(bf)
        else:
            h = jnp.maximum(acc, 0.0).astype(bf)

    if plan[-1] == "heads_vd":
        w_sig, b_sig = next(it), next(it)
        w_feat, b_feat = next(it), next(it)
        Wf = next(it)
        b_v = next(it)
        w_rgb, b_rgb = next(it), next(it)

        sigma = (_mm(h, w_sig) + b_sig)[:, :1]           # padded → (rows,1)
        feat = (_mm(h, w_feat) + b_feat).astype(bf)
        # d = precomputed per-ray γ(d)@W_dir, expanded per sample
        h2 = _mm(feat, Wf) + d.astype(jnp.float32) + b_v
        h2 = jnp.maximum(h2, 0.0).astype(bf)
        rgb = jax.nn.sigmoid((_mm(h2, w_rgb) + b_rgb)[:, :3])
    else:
        w_o, b_o = next(it), next(it)
        raw = _mm(h, w_o) + b_o                          # padded (rows,128)
        rgb = jax.nn.sigmoid(raw[:, :3])
        sigma = raw[:, 3:4]
    return rgb, sigma


def _field_kernel(plan, L, spr, alive_ref, pts_ref, dirpart_ref, *refs):
    has_cond = any(t.endswith("_c") for t in plan)
    if has_cond:
        condpart_ref, fmat_ref, off_ref, *refs = refs
    else:
        condpart_ref = None
        fmat_ref, off_ref, *refs = refs
    *w_refs, rgb_ref, sigma_ref = refs
    ws = [r[:] for r in w_refs]
    T = pts_ref.shape[0]
    half = T // _INTERLEAVE

    def _perray_half(ref, j):
        # per-RAY rows expanded to per-sample in VMEM (ray-major: each row
        # repeats spr consecutive times), one interleave-half at a time to
        # stay inside the VMEM budget. Expanding on the host side
        # materializes an (n, 128) bf16 stream — measured ~270 MB of HBM
        # traffic per 1M-row launch, a big slice of the dead-chunk floor.
        if spr == 1:
            return ref[pl.ds(j * half, half), :]
        rows = half // spr
        blk = ref[pl.ds(j * rows, rows), :]
        return jnp.broadcast_to(
            blk[:, None, :], (rows, spr, blk.shape[-1])
        ).reshape(half, blk.shape[-1])

    def run_half(x, d, c):
        return mlp_rows(plan, L, ws, fmat_ref[:], off_ref[:], x, d, c)

    # per-tile predication — the early-ray-termination lever (VERDICT r1 #2):
    # when every ray in this tile is terminated (transmittance < ε) or culled
    # (missed the occupancy box), the whole MXU workload of the tile is
    # skipped; the scalar branch costs nothing when alive. The alive flags
    # sit whole-array in SMEM, packed 128-wide: Mosaic rejects (1,1) blocks
    # of an (n_tiles,1) array, and an (n_tiles,1) SMEM window lane-pads to
    # ×128 bytes (a 3072-tile grid overflows the 1 MB SMEM budget).
    _pid = pl.program_id(0)
    @pl.when(alive_ref[_pid // 128, _pid % 128] > 0)
    def _run():
        for j in range(_INTERLEAVE):
            sl = pl.ds(j * half, half)
            c = (_perray_half(condpart_ref, j) if has_cond else None)
            rgb, sigma = run_half(pts_ref[sl, :], _perray_half(dirpart_ref, j),
                                  c)
            rgb_ref[sl, :] = rgb
            sigma_ref[sl, :] = sigma

    @pl.when(alive_ref[_pid // 128, _pid % 128] <= 0)
    def _dead():
        # outputs must still be written: unwritten VMEM is NaN canaries in
        # interpret mode / garbage on hardware, and NaN × tiny-weight = NaN
        rgb_ref[:] = jnp.zeros_like(rgb_ref)
        sigma_ref[:] = jnp.full_like(sigma_ref, _DEAD_SIGMA)


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("plan", "L", "interpret", "spr"))
def _fused_eval(weight_arrs, pts_flat, dirpart_flat, plan, L,
                interpret=False, alive=None, spr=1, condpart_flat=None):
    """spr (samples per ray): when >1, dirpart_flat/condpart_flat hold ONE
    row per ray ((n/spr, ·)) and the kernel expands them per sample in VMEM —
    the host-side broadcast is ~spr× the HBM traffic. condpart_flat: the
    hoisted cond-branch rows, required iff the plan carries "_c" tags."""
    n = pts_flat.shape[0]
    has_cond = any(t.endswith("_c") for t in plan)
    assert has_cond == (condpart_flat is not None), plan
    # conditioned plans halve the tile: the double-buffered (tile, nc·W)
    # condpart window pushed tile=2048 240 KB past the 16 MB VMEM scope
    # (measured r3 on the viton train graph; a single-tile grid hides it)
    tile = min(_TILE // 2 if has_cond else _TILE, n)
    assert n % tile == 0, (n, tile)
    # each interleave-half must cover whole rays for the in-kernel expand
    assert tile % (spr * _INTERLEAVE) == 0, (tile, spr)
    grid = (n // tile,)
    if alive is None:
        alive = jnp.ones((n // tile, 1), jnp.float32)
    assert alive.shape == (n // tile, 1), (alive.shape, n, tile)
    assert dirpart_flat.shape[0] == n // spr, (dirpart_flat.shape, n, spr)
    # pack flags 128-wide for SMEM (see kernel comment)
    n_tiles = n // tile
    pad_t = (-n_tiles) % 128
    alive = jnp.pad(alive.reshape(-1), (0, pad_t)).reshape(-1, 128)

    fmat = jnp.asarray(_freq_row(max(L, 1)))
    foff = jnp.asarray(_phase_offset(max(L, 1)))

    kernel = functools.partial(_field_kernel, plan, L, spr)

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _perray(a):
        return pl.BlockSpec((tile // spr, a.shape[1]),
                            lambda i: (i, 0), memory_space=pltpu.VMEM)

    cond_inputs = (condpart_flat,) if has_cond else ()
    in_specs = [
        pl.BlockSpec(alive.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _perray(dirpart_flat),
    ] + [_perray(a) for a in cond_inputs] + [
        _const2d(fmat),
        _const2d(foff),
    ] + [_const2d(a) for a in weight_arrs]

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
            transcendentals=int(n * (6 * L + 3)),
        ),
        interpret=interpret,
    )(alive, pts_flat, dirpart_flat, *cond_inputs, fmat, foff, *weight_arrs)
    return rgb, sigma


def make_fused_field(cfg: Config):
    """Field fn with the models/ convention:
    field(params, pts (R,S,3), viewdirs (R,3), cond (R,Cc)|None)
    → (rgb, sigma).

    Conditioned inputs run the same fused kernel (VERDICT r2 #4): the cond
    rows of trunk_0/skip kernels act on per-ray data, so cond @ cond_kernel
    is hoisted to XLA exactly like the view branch and enters as a per-ray
    operand. Gradients flow via the Pallas VJP (or XLA recompute fallback).
    """
    mcfg = cfg.model
    interpret = cfg.kernels.interpret
    from fashion_nerf.models.nerf_mlp import make_field
    _, xla_field = make_field(mcfg)

    def _fused_forward(params, pts, viewdirs, cond):
        R, S = pts.shape[0], pts.shape[1]
        n = R * S
        tile = min(_TILE // 2 if cond is not None else _TILE, n)
        pad = (-n) % tile
        pts_flat = pts.reshape(n, 3)
        arrs, plan, dir_kernel, cond_kernel = pack_params(params, mcfg)
        if mcfg.use_viewdirs:
            # per-RAY view-branch contribution, computed once in XLA and
            # expanded per sample (in-kernel per-sample dir work is 64×
            # redundant and measured at ~20% of kernel time)
            d_unit = viewdirs / jnp.linalg.norm(viewdirs, axis=-1,
                                                keepdims=True)
            d_enc = posenc(d_unit, mcfg.posenc_dir)          # (R, Cd)
            dirpart = jnp.dot(d_enc, dir_kernel,
                              preferred_element_type=jnp.float32)
            dirpart_flat = jnp.broadcast_to(
                dirpart.astype(jnp.bfloat16)[:, None, :],
                (R, S, dirpart.shape[-1])).reshape(n, -1)
        else:
            dirpart_flat = jnp.zeros((n, 128), jnp.bfloat16)
        condpart_flat = None
        if cond is not None:
            assert cond_kernel is not None, \
                "cond passed but params carry no cond rows"
            condpart = jnp.dot(cond, cond_kernel,
                               preferred_element_type=jnp.float32)
            condpart_flat = jnp.broadcast_to(
                condpart.astype(jnp.bfloat16)[:, None, :],
                (R, S, condpart.shape[-1])).reshape(n, -1)
        if pad:
            pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
            dirpart_flat = jnp.pad(dirpart_flat, ((0, pad), (0, 0)))
            if condpart_flat is not None:
                condpart_flat = jnp.pad(condpart_flat, ((0, pad), (0, 0)))
        rgb, sigma = _fused_eval(tuple(arrs), pts_flat, dirpart_flat, plan,
                                 mcfg.posenc_xyz, interpret,
                                 condpart_flat=condpart_flat)
        rgb = rgb[:n].reshape(R, S, 3)
        sigma = sigma[:n, 0].reshape(R, S)
        return rgb, sigma

    @jax.custom_vjp
    def field_core(params, pts, viewdirs):
        return _fused_forward(params, pts, viewdirs, None)

    def _fwd(params, pts, viewdirs):
        out = _fused_forward(params, pts, viewdirs, None)
        return out, (params, pts, viewdirs)

    def _bwd(res, g):
        params, pts, viewdirs = res
        if cfg.kernels.fused_backward:
            grads, d_pts, d_vd, _ = _pallas_backward(
                params, pts, viewdirs, None, g[0], g[1], mcfg, interpret)
            return grads, d_pts, d_vd
        _, vjp = jax.vjp(lambda p, x, d: xla_field(p, x, d, None),
                         params, pts, viewdirs)
        return vjp(g)

    field_core.defvjp(_fwd, _bwd)

    @jax.custom_vjp
    def field_core_cond(params, pts, viewdirs, cond):
        return _fused_forward(params, pts, viewdirs, cond)

    def _fwd_c(params, pts, viewdirs, cond):
        out = _fused_forward(params, pts, viewdirs, cond)
        return out, (params, pts, viewdirs, cond)

    def _bwd_c(res, g):
        params, pts, viewdirs, cond = res
        if cfg.kernels.fused_backward:
            return _pallas_backward(params, pts, viewdirs, cond, g[0], g[1],
                                    mcfg, interpret)
        _, vjp = jax.vjp(xla_field, params, pts, viewdirs, cond)
        return vjp(g)

    field_core_cond.defvjp(_fwd_c, _bwd_c)

    def field(params, pts, viewdirs=None, cond=None):
        if viewdirs is None:
            if mcfg.use_viewdirs:
                raise ValueError("use_viewdirs=True requires viewdirs")
            viewdirs = jnp.ones((pts.shape[0], 3), jnp.float32)
        if cond is not None:
            return field_core_cond(params, pts, viewdirs, cond)
        return field_core(params, pts, viewdirs)

    return field


def make_block_evaluator(cfg: Config, mcfg: ModelConfig = None):
    """Lower-level entry for the blockwise early-terminated render pipeline
    (render/blockwise.py): evaluates the fused field on ONE sample-block of
    every ray, with per-tile alive predication.

    mcfg: optional ModelConfig override — the blockwise renderer marches the
    σ-only proposal net (models/proposal.py, r4) through this same machinery
    with its own smaller architecture; default is cfg.model.

    Returns (pack, hoist_dirs, hoist_cond, eval_block, rays_per_tile):
      pack(params) → packed — weight arrays + static plan, once per image.
      hoist_dirs(packed, viewdirs (R,3)) → dirpart (R,128) bf16 — the
        per-ray view-branch contribution, ONCE per chunk/pass (reused across
        blocks; recomputing it per block would redo the γ(d) matmul NB×).
      hoist_cond(packed, cond (R,Cc)|None) → condpart (R, n_cond·W) bf16 or
        None — the per-ray cond-branch contribution (same hoist pattern).
      eval_block(packed, dirpart, condpart, pts (R,SB,3),
                 alive (n_tiles,1) f32) → (rgb (R,SB,3), sigma (R,SB)).
        Rows are ray-major (SB consecutive rows per ray); tile t covers rays
        [t·rays_per_tile(SB), (t+1)·rays_per_tile(SB)) — alive[t] ≤ 0 skips
        that tile's entire MXU workload and writes exact-zero-weight
        sentinels instead.
    rays_per_tile(SB) = _TILE // SB; callers pad R to a multiple of it.
    """
    mcfg = mcfg if mcfg is not None else cfg.model
    interpret = cfg.kernels.interpret

    def pack(params):
        arrs, plan, dir_kernel, cond_kernel = pack_params(params, mcfg)
        return (tuple(arrs), plan, dir_kernel, cond_kernel)

    def hoist_dirs(packed, viewdirs):
        dir_kernel = packed[2]
        R = viewdirs.shape[0]
        if mcfg.use_viewdirs:
            d_unit = viewdirs / jnp.linalg.norm(viewdirs, axis=-1,
                                                keepdims=True)
            d_enc = posenc(d_unit, mcfg.posenc_dir)
            return jnp.dot(d_enc, dir_kernel,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)             # (R, 128)
        return jnp.zeros((R, 128), jnp.bfloat16)

    def hoist_cond(packed, cond):
        cond_kernel = packed[3]
        if cond is None:
            return None
        assert cond_kernel is not None, \
            "cond passed but params carry no cond rows"
        return jnp.dot(cond, cond_kernel,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)                 # (R, nc·W)

    # conditioned models run a halved tile (see _fused_eval: the condpart
    # window overflows the VMEM scope at 2048)
    tile_eff = (_TILE // 2 if (mcfg.conditioned or mcfg.n_latents > 0)
                else _TILE)

    def eval_block(packed, dirpart, condpart, pts, alive):
        arrs, plan = packed[0], packed[1]
        R, SB = pts.shape[0], pts.shape[1]
        n = R * SB
        assert n % tile_eff == 0, (R, SB, tile_eff)
        pts_flat = pts.reshape(n, 3)
        # dirpart/condpart stay per-RAY ((R, ·)); the kernel expands them per
        # sample in VMEM (spr=SB) instead of streaming an (n, ·) broadcast
        rgb, sigma = _fused_eval(arrs, pts_flat, dirpart, plan,
                                 mcfg.posenc_xyz, interpret, alive=alive,
                                 spr=SB, condpart_flat=condpart)
        return rgb.reshape(R, SB, 3), sigma[:, 0].reshape(R, SB)

    def rays_per_tile(block_samples: int) -> int:
        assert tile_eff % block_samples == 0, (block_samples, tile_eff)
        return tile_eff // block_samples

    return pack, hoist_dirs, hoist_cond, eval_block, rays_per_tile


# --------------------------------------------------------------------------
# fused backward (VERDICT r1 #5): gradients without the XLA recompute tax
# --------------------------------------------------------------------------

_BWD_TILE = 512    # backward keeps 8 trunk activations + f32 grad
                   # accumulators resident; 1024 rows measured 2.3 MB over
                   # the 16 MB VMEM budget on v5e


def _mmT(a, w):
    """a (T,n) @ w (m,n)^T → (T,m), f32 accumulate — the dgrad matmul."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mmAT(a, b):
    """a (T,m)^T @ b (T,n) → (m,n), f32 accumulate — the wgrad matmul."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dx_row(L: int, d: int = 3) -> np.ndarray:
    """(2dL, 128) backprop of the block-repeated phase layout: column j
    collects dP rows {b·d+j} scaled by the per-block frequency (chain rule
    through P = repeat(x)·freq + off). Padded to 128 lanes (tiny-N matmuls
    take slow Mosaic paths — same rationale as pad_cols in pack_params)."""
    m = np.zeros((2 * d * L, 128), np.float32)
    for b in range(2 * L):
        for j in range(d):
            m[d * b + j, j] = 2.0 ** (b % L)
    return m


def _field_bwd_kernel(plan, L, n_arrs, pts_ref, dirpart_ref, *refs):
    """Recompute the fused forward for this tile, then backprop it entirely
    in VMEM. Weight/bias grads accumulate across the (sequential) TPU grid
    into the (0,0)-mapped output refs; dx/ddir (and dcond for conditioned
    plans) are per-row outputs.

    Ref layout: [condpart_ref if conditioned] ga_ref, gb_ref, fmat, off,
    rmat, [*w_refs (n_arrs)] then outputs
    [dx_ref (T,3), ddir_ref (T,128), [dcond_ref (T, nc·W)], *gw_refs].
    """
    has_cond = any(t.endswith("_c") for t in plan)
    if has_cond:
        condpart_ref, *refs = refs
    ga_ref, gb_ref, fmat_ref, off_ref, rmat_ref, *refs = refs
    w_refs = refs[:n_arrs]
    dx_ref, ddir_ref = refs[n_arrs], refs[n_arrs + 1]
    if has_cond:
        dcond_ref = refs[n_arrs + 2]
        gw_refs = refs[n_arrs + 3:]
    else:
        dcond_ref = None
        gw_refs = refs[n_arrs + 2:]
    bf = jnp.bfloat16
    ws = [r[:] for r in w_refs]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in gw_refs:
            r[:] = jnp.zeros_like(r)

    x = pts_ref[:]
    P = pltpu.repeat(x, 2 * L, axis=1) * fmat_ref[:] + off_ref[:]
    SnCs_f = jnp.sin(P)
    SnCs = SnCs_f.astype(bf)
    x_bf = x.astype(bf)
    d_in = dirpart_ref[:]
    c_in = condpart_ref[:] if has_cond else None

    # ---- forward recompute, collecting per-layer (tag, arr-indices, input,
    # cond-slice index) — h is stored per layer (post-relu, bf16); masks
    # reconstruct from h > 0
    idx = 0
    ci = 0
    Wd = None            # trunk width (cond slice stride)
    layers = []          # (tag, idx_of_first_arr, h_input or None, ci)
    hs = []
    h = None
    for tag in plan[:-1]:
        layer_ci = None
        if tag in ("first", "first_c"):
            Wx, Wsc, b = ws[idx], ws[idx + 1], ws[idx + 2]
            Wd = Wx.shape[1]
            acc = _mm_trunk(x_bf, Wx) + _mm_trunk(SnCs, Wsc)
            if tag == "first_c":
                layer_ci = ci
                ci += 1
            layers.append((tag, idx, None, layer_ci))
            idx += 3
        elif tag in ("skip", "skip_c"):
            Wh, Wx, Wsc, b = ws[idx], ws[idx + 1], ws[idx + 2], ws[idx + 3]
            acc = _mm_trunk(h, Wh) + _mm_trunk(x_bf, Wx) \
                + _mm_trunk(SnCs, Wsc)
            if tag == "skip_c":
                layer_ci = ci
                ci += 1
            layers.append((tag, idx, h, layer_ci))
            idx += 4
        else:
            Wh, b = ws[idx], ws[idx + 1]
            acc = _mm_trunk(h, Wh)
            layers.append((tag, idx, h, None))
            idx += 2
        if layer_ci is not None:
            acc = acc + c_in[:, layer_ci * Wd:(layer_ci + 1) * Wd].astype(
                acc.dtype)
        h = jnp.maximum(acc + b.astype(acc.dtype), 0.0).astype(bf)
        hs.append(h)

    gvals = {}           # arr index → gradient value (each arr used once)
    ga = ga_ref[:]
    gb = gb_ref[:]

    if plan[-1] == "heads_vd":
        i_sig, i_feat, i_view, i_rgb = idx, idx + 2, idx + 4, idx + 6
        w_sig, b_sig = ws[i_sig], ws[i_sig + 1]
        w_feat, b_feat = ws[i_feat], ws[i_feat + 1]
        Wf, b_v = ws[i_view], ws[i_view + 1]
        w_rgb, b_rgb = ws[i_rgb], ws[i_rgb + 1]

        feat = (_mm(hs[-1], w_feat) + b_feat).astype(bf)
        h2pre = _mm(feat, Wf) + d_in.astype(jnp.float32) + b_v
        h2 = jnp.maximum(h2pre, 0.0).astype(bf)
        s = jax.nn.sigmoid(_mm(h2, w_rgb) + b_rgb)

        # rgb head (sigmoid): cotangent ga is zero on padded lanes
        d_raw = (ga * s * (1.0 - s)).astype(bf)
        gvals[i_rgb] = _mmAT(h2, d_raw)
        gvals[i_rgb + 1] = jnp.sum(d_raw.astype(jnp.float32), axis=0,
                                   keepdims=True)
        d_h2 = _mmT(d_raw, w_rgb)
        d_h2pre = jnp.where(h2pre > 0.0, d_h2, 0.0)
        ddir_ref[:] = d_h2pre                       # per-sample dir cotangent
        d_h2pre_bf = d_h2pre.astype(bf)
        gvals[i_view] = _mmAT(feat, d_h2pre_bf)
        gvals[i_view + 1] = jnp.sum(d_h2pre, axis=0, keepdims=True)
        d_feat = _mmT(d_h2pre_bf, Wf).astype(bf)
        gvals[i_feat] = _mmAT(hs[-1], d_feat)
        gvals[i_feat + 1] = jnp.sum(d_feat.astype(jnp.float32), axis=0,
                                    keepdims=True)
        # sigma head (identity): cotangent gb, zero on padded lanes
        gb_bf = gb.astype(bf)
        gvals[i_sig] = _mmAT(hs[-1], gb_bf)
        gvals[i_sig + 1] = jnp.sum(gb, axis=0, keepdims=True)
        d_h = _mmT(d_feat, w_feat) + _mmT(gb_bf, w_sig)
    else:
        i_out = idx
        w_o, b_o = ws[i_out], ws[i_out + 1]
        s = jax.nn.sigmoid(_mm(hs[-1], w_o) + b_o)
        # lanes 0-2: sigmoid'd rgb (ga); lane 3: identity sigma (gb)
        d_raw = (ga * s * (1.0 - s) + gb).astype(bf)
        gvals[i_out] = _mmAT(hs[-1], d_raw)
        gvals[i_out + 1] = jnp.sum(d_raw.astype(jnp.float32), axis=0,
                                   keepdims=True)
        ddir_ref[:] = jnp.zeros_like(ddir_ref)
        d_h = _mmT(d_raw, w_o)

    # ---- trunk backward (reverse layer order) ----
    d_SnCs = jnp.zeros_like(SnCs_f)
    d_x_lin = jnp.zeros((x.shape[0], 128), jnp.float32)
    for li in range(len(layers) - 1, -1, -1):
        tag, i0, h_prev, layer_ci = layers[li]
        # relu mask: compare in f32 — Mosaic rejects bf16 cmpf on v5e
        mask = hs[li].astype(jnp.float32) > 0.0
        d_pre = jnp.where(mask, d_h, 0.0)
        d_pre_bf = d_pre.astype(bf)
        if layer_ci is not None:
            # cond enters acc additively ⇒ its cotangent IS d_pre; the
            # hoisted cond @ cond_kernel product is backpropped in XLA
            dcond_ref[:, layer_ci * Wd:(layer_ci + 1) * Wd] = d_pre
        if tag in ("first", "first_c"):
            Wx, Wsc = ws[i0], ws[i0 + 1]
            gvals[i0] = _mmAT(x_bf, d_pre_bf)
            gvals[i0 + 1] = _mmAT(SnCs, d_pre_bf)
            gvals[i0 + 2] = jnp.sum(d_pre, axis=0, keepdims=True)
            d_SnCs += _mmT(d_pre_bf, Wsc)
            d_x_lin += jnp.pad(_mmT(d_pre_bf, Wx),
                               ((0, 0), (0, 125)))
            d_h = None
        elif tag in ("skip", "skip_c"):
            Wh, Wx, Wsc = ws[i0], ws[i0 + 1], ws[i0 + 2]
            gvals[i0] = _mmAT(h_prev, d_pre_bf)
            gvals[i0 + 1] = _mmAT(x_bf, d_pre_bf)
            gvals[i0 + 2] = _mmAT(SnCs, d_pre_bf)
            gvals[i0 + 3] = jnp.sum(d_pre, axis=0, keepdims=True)
            d_SnCs += _mmT(d_pre_bf, Wsc)
            d_x_lin += jnp.pad(_mmT(d_pre_bf, Wx), ((0, 0), (0, 125)))
            d_h = _mmT(d_pre_bf, Wh)
        else:
            Wh = ws[i0]
            gvals[i0] = _mmAT(h_prev, d_pre_bf)
            gvals[i0 + 1] = jnp.sum(d_pre, axis=0, keepdims=True)
            d_h = _mmT(d_pre_bf, Wh)

    # phase backprop: d/dP sin = cos; chain through repeat·freq via rmat
    dP = d_SnCs * jnp.cos(P)
    d_x = jnp.dot(dP, rmat_ref[:],
                  preferred_element_type=jnp.float32) + d_x_lin
    dx_ref[:] = d_x[:, :3]

    for i, r in enumerate(gw_refs):
        r[:] += gvals[i].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("plan", "L", "interpret"))
def _fused_bwd_eval(weight_arrs, pts_flat, dirpart_flat, ga_flat, gb_flat,
                    plan, L, interpret=False, condpart_flat=None):
    n = pts_flat.shape[0]
    has_cond = any(t.endswith("_c") for t in plan)
    assert has_cond == (condpart_flat is not None), plan
    # conditioned plans halve the backward tile too: condpart input +
    # (tile, nc·W) f32 dcond output don't fit the 512-row budget
    # (_BWD_TILE rationale — 1024 rows already measured 2.3 MB over)
    tile = min(_BWD_TILE // 2 if has_cond else _BWD_TILE, n)
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)

    fmat = jnp.asarray(_freq_row(max(L, 1)))
    foff = jnp.asarray(_phase_offset(max(L, 1)))
    rmat = jnp.asarray(_dx_row(max(L, 1)))

    kernel = functools.partial(_field_bwd_kernel, plan, L, len(weight_arrs))

    def _const2d(a):
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def _rows(width):
        return pl.BlockSpec((tile, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    cond_inputs = (condpart_flat,) if has_cond else ()
    in_specs = [_rows(3), _rows(dirpart_flat.shape[1])] \
        + [_rows(a.shape[1]) for a in cond_inputs] \
        + [_rows(128), _rows(128), _const2d(fmat), _const2d(foff),
           _const2d(rmat)] \
        + [_const2d(a) for a in weight_arrs]

    dw = dirpart_flat.shape[1]
    cw = condpart_flat.shape[1] if has_cond else 0
    dcond_out = ((_rows(cw),), (jax.ShapeDtypeStruct((n, cw), jnp.float32),)
                 ) if has_cond else ((), ())
    out_specs = (_rows(3), _rows(dw)) + dcond_out[0] + tuple(
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in weight_arrs)
    out_shape = (
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
        jax.ShapeDtypeStruct((n, dw), jnp.float32),
    ) + dcond_out[1] + tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32)
                             for a in weight_arrs)

    flops_row = 3 * 2 * 0.53e6    # recompute + dgrad + wgrad
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(n * flops_row),
            bytes_accessed=int(n * (3 + 3 + 4) * 4),
            transcendentals=int(n * (12 * L + 6)),
        ),
        interpret=interpret,
    )(pts_flat, dirpart_flat, *cond_inputs, ga_flat, gb_flat, fmat, foff,
      rmat, *weight_arrs)
    if has_cond:
        return outs[0], outs[1], outs[2], outs[3:]
    return outs[0], outs[1], None, outs[2:]


def _pallas_backward(params, pts, viewdirs, cond, g_rgb, g_sigma,
                     mcfg: ModelConfig, interpret: bool):
    """Full VJP of the fused field in one Pallas pass (VERDICT r1 #5):
    in-kernel forward recompute (zero HBM activation traffic) + dgrad/wgrad,
    then the per-ray view-branch (and cond-branch) hoists are backpropped by
    exact XLA vjps.

    Returns (param grads tree, d_pts, d_viewdirs, d_cond)."""
    R, S = pts.shape[0], pts.shape[1]
    n = R * S
    tile = min(_BWD_TILE // 2 if cond is not None else _BWD_TILE, n)
    pad = (-n) % tile
    arrs, plan, dir_kernel, cond_kernel = pack_params(params, mcfg)

    hoist_vjp = None
    if mcfg.use_viewdirs:
        def hoist(vd, dk):
            d_unit = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
            d_enc = posenc(d_unit, mcfg.posenc_dir)
            return jnp.dot(d_enc, dk, preferred_element_type=jnp.float32)

        dirpart, hoist_vjp = jax.vjp(hoist, viewdirs, dir_kernel)
        dirpart_flat = jnp.broadcast_to(
            dirpart.astype(jnp.bfloat16)[:, None, :],
            (R, S, dirpart.shape[-1])).reshape(n, -1)
    else:
        dirpart_flat = jnp.zeros((n, 128), jnp.bfloat16)

    cond_vjp, condpart_flat = None, None
    if cond is not None:
        def cond_hoist(c, ck):
            return jnp.dot(c, ck, preferred_element_type=jnp.float32)

        condpart, cond_vjp = jax.vjp(cond_hoist, cond, cond_kernel)
        condpart_flat = jnp.broadcast_to(
            condpart.astype(jnp.bfloat16)[:, None, :],
            (R, S, condpart.shape[-1])).reshape(n, -1)

    pts_flat = pts.reshape(n, 3)
    ga = jnp.pad(g_rgb.reshape(n, 3).astype(jnp.float32),
                 ((0, 0), (0, 125)))
    gs = g_sigma.reshape(n, 1).astype(jnp.float32)
    if plan[-1] == "heads_vd":
        gb = jnp.pad(gs, ((0, 0), (0, 127)))
    else:
        gb = jnp.pad(gs, ((0, 0), (3, 124)))   # σ sits at lane 3 of out_head
    if pad:
        pts_flat = jnp.pad(pts_flat, ((0, pad), (0, 0)))
        dirpart_flat = jnp.pad(dirpart_flat, ((0, pad), (0, 0)))
        ga = jnp.pad(ga, ((0, pad), (0, 0)))
        gb = jnp.pad(gb, ((0, pad), (0, 0)))
        if condpart_flat is not None:
            condpart_flat = jnp.pad(condpart_flat, ((0, pad), (0, 0)))

    dx, ddir, dcond_rows, gw = _fused_bwd_eval(
        tuple(arrs), pts_flat, dirpart_flat, ga, gb, plan, mcfg.posenc_xyz,
        interpret, condpart_flat=condpart_flat)
    d_pts = dx[:n].reshape(R, S, 3)
    d_dir_kernel = None
    if mcfg.use_viewdirs:
        ddir_ray = jnp.sum(ddir[:n].reshape(R, S, -1), axis=1)
        d_viewdirs, d_dir_kernel = hoist_vjp(ddir_ray)
    else:
        d_viewdirs = jnp.zeros_like(viewdirs)
    d_cond, d_cond_kernel = None, None
    if cond is not None:
        dcond_ray = jnp.sum(dcond_rows[:n].reshape(R, S, -1), axis=1)
        d_cond, d_cond_kernel = cond_vjp(dcond_ray)
    grads = _unpack_grads(gw, d_dir_kernel, params, mcfg,
                          d_cond_kernel=d_cond_kernel)
    return grads, d_pts, d_viewdirs, d_cond


def _unsplit_posenc_grad(gWx, gWsc, L: int, d: int = 3):
    """Inverse of _split_posenc_kernel: reassemble the (d(1+2L), n) kernel
    grad from the (d,n) x-part and the [sin rows; cos rows] (2dL, n) part."""
    rows = [gWx]
    for i in range(L):
        rows.append(gWsc[d * i: d * (i + 1)])                    # sin rows
        rows.append(gWsc[d * L + d * i: d * L + d * (i + 1)])    # cos rows
    return jnp.concatenate(rows, axis=0)


def _unpack_grads(gw, d_dir_kernel, params, mcfg: ModelConfig,
                  d_cond_kernel=None):
    """Map the flat kernel-layout grads back onto the flax param tree
    (inverse of pack_params). d_dir_kernel: (Cd, W//2) grad of view_0's
    direction rows; d_cond_kernel: (Cc, n_cond·W) grad of the hoisted cond
    rows — both computed by XLA hoist vjps (None when absent)."""
    p = params["params"]
    L = mcfg.posenc_xyz
    cx = 3 * (2 * L + 1)
    W = mcfg.net_width
    out = {}
    it = iter(gw)
    ci = 0

    def cond_slice():
        nonlocal ci
        g = d_cond_kernel[:, ci * W:(ci + 1) * W]
        ci += 1
        return g

    for i in range(mcfg.net_depth):
        k = p[f"trunk_{i}"]["kernel"]
        has_cond = d_cond_kernel is not None
        if i == 0:
            gWx, gWsc, gb = next(it), next(it), next(it)
            gk = _unsplit_posenc_grad(gWx, gWsc, L)
            if has_cond:
                gk = jnp.concatenate([gk, cond_slice()], axis=0)
        elif k.shape[0] > W:
            gWh, gWx, gWsc, gb = next(it), next(it), next(it), next(it)
            parts = [_unsplit_posenc_grad(gWx, gWsc, L)]
            if has_cond:
                parts.append(cond_slice())
            gk = jnp.concatenate(parts + [gWh], axis=0)
        else:
            gk, gb = next(it), next(it)
        out[f"trunk_{i}"] = {"kernel": gk, "bias": gb.reshape(-1)}

    if mcfg.use_viewdirs:
        gk_sig, gb_sig = next(it), next(it)
        gk_feat, gb_feat = next(it), next(it)
        gk_view, gb_view = next(it), next(it)
        gk_rgb, gb_rgb = next(it), next(it)
        W = mcfg.net_width
        out["sigma_head"] = {"kernel": gk_sig[:, :1],
                             "bias": gb_sig.reshape(-1)[:1]}
        out["feature"] = {"kernel": gk_feat, "bias": gb_feat.reshape(-1)}
        half = p["view_0"]["kernel"].shape[1]
        out["view_0"] = {
            "kernel": jnp.concatenate(
                [gk_view[:, :half], d_dir_kernel[:, :half]], axis=0),
            "bias": gb_view.reshape(-1)[:half]}
        out["rgb_head"] = {"kernel": gk_rgb[:, :3],
                           "bias": gb_rgb.reshape(-1)[:3]}
    else:
        gk_o, gb_o = next(it), next(it)
        out["out_head"] = {"kernel": gk_o[:, :4],
                           "bias": gb_o.reshape(-1)[:4]}
    return {"params": out}


# SURVEY.md §2.1 inventory name for this substrate
fused_posenc_mlp = make_fused_field
