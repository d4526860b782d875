"""TPU-native substrate #2 (SURVEY.md §2.1): fused inverse-CDF resampling.

BASELINE.json:5 — "hierarchical importance sampling … fuse into Pallas
kernels". Per ray tile, entirely in VMEM: weight normalization, the CDF
prefix-sum (triangular matmul — no cumsum lowering on Mosaic), and the
inverse-CDF lookup as a fori_loop bin sweep of elementwise select updates
(TPU has no per-row dynamic gather worth using; monotone cdf/bins make
"last bin with cdf ≤ u" a running select — SURVEY.md §7 hard-part 1's
fixed-size-network answer). The swept edge always sits at lane 0 via
pltpu.roll (lane-dynamic slicing must be 128-aligned), and the loop form
keeps live ranges small enough for 512-row tiles (an unrolled sweep hit
28 MB VMEM at that size).

The XLA twin (core.sampling.sample_pdf) uses the same masked-reduce math;
this kernel removes its (R, N, B) broadcast traffic through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 512   # fori_loop sweep (vs Python unroll) keeps live ranges small
                # enough for 512-row tiles
_NEG, _POS = -1e10, 1e10


def _resample_kernel(bins_ref, wpad_ref, u_ref, tri_ref, out_ref, cdf_ref,
                     *, n_bins: int, eps: float):
    w = wpad_ref[:]                                  # (T, Bp) zero-padded
    wsum = jnp.sum(w, axis=1, keepdims=True) + eps * n_bins
    pdf = (w + eps) / wsum                           # pad lanes add eps/wsum
    # prefix sum over REAL bins only: tri is zero in pad rows/cols. Staged
    # through VMEM scratch so the bin sweep can dynamic-slice a REF (value
    # dynamic_slice has no Mosaic lowering).
    cdf_ref[:] = jnp.dot(pdf, tri_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (T,Bp)

    u = u_ref[:]                                     # (T, N)
    cb0 = jnp.zeros_like(u)                          # cdf[0] = 0 qualifies
    bb0 = jnp.broadcast_to(bins_ref[:, 0:1], u.shape)
    ca0 = jnp.full_like(u, _POS)
    ba0 = jnp.full_like(u, _POS)

    # edge 0 (cdf=0) handled by init; sweep edges 1..B (inclusive cdf cols).
    # fori_loop (not a Python unroll — unrolled live ranges blew VMEM at
    # 28 MB / 512-row tiles). Lane-dynamic slicing needs 128-alignment on
    # TPU, so the arrays ROLL instead: the current edge is always lane 0.
    Bp = cdf_ref.shape[1]
    cdf_roll0 = cdf_ref[:]
    # pltpu.roll takes non-negative shifts: left-rotate by 1 == roll Bp-1
    bins_roll0 = pltpu.roll(bins_ref[:], Bp - 1, axis=1)  # lane 0 = bins[1]

    def body(b, carry):
        cb, bb, ca, ba, cdf_r, bins_r = carry
        c = cdf_r[:, 0:1]                            # cdf edge b+1
        bin_b = bins_r[:, 0:1]                       # bins edge b+1
        le = c <= u
        cb = jnp.where(le, c, cb)                    # monotone → last wins
        bb = jnp.where(le, bin_b, bb)
        first_gt = (~le) & (ca >= _POS * 0.5)
        ca = jnp.where(first_gt, c, ca)
        ba = jnp.where(first_gt, bin_b, ba)
        return (cb, bb, ca, ba,
                pltpu.roll(cdf_r, Bp - 1, axis=1),
                pltpu.roll(bins_r, Bp - 1, axis=1))

    cb, bb, ca, ba, _, _ = jax.lax.fori_loop(
        0, n_bins, body, (cb0, bb0, ca0, ba0, cdf_roll0, bins_roll0))
    # u beyond the last edge → clamp to it
    last_c = cdf_ref[:, n_bins - 1:n_bins]
    last_b = bins_ref[:, n_bins:n_bins + 1]
    empty = ca >= _POS * 0.5
    ca = jnp.where(empty, last_c, ca)
    ba = jnp.where(empty, last_b, ba)

    denom = ca - cb
    denom = jnp.where(denom < eps, 1.0, denom)
    out_ref[:] = bb + (u - cb) / denom * (ba - bb)


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def _resample(bins, wpad, u, n_bins: int, interpret: bool):
    R, N = u.shape
    Bp = wpad.shape[1]
    tile = min(_TILE_R, R)
    assert R % tile == 0
    grid = (R // tile,)
    # tri[j, i] = 1 iff j <= i, zeroed outside the real bins → inclusive
    # prefix-sum restricted to real mass
    tri = np.tril(np.ones((Bp, Bp), np.float32), k=0).T
    tri[n_bins:, :] = 0.0
    tri = jnp.asarray(tri)

    return pl.pallas_call(
        functools.partial(_resample_kernel, n_bins=n_bins, eps=1e-5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, bins.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, Bp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, Bp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, Bp), jnp.float32)],
        interpret=interpret,
    )(bins, wpad, u, tri)


def resample_cdf(key, bins, weights, n_samples: int, det: bool = False,
                 interpret: bool = False):
    """Drop-in twin of core.sampling.sample_pdf (same signature/semantics)."""
    R, B = weights.shape
    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32),
            (R, n_samples))
    else:
        u = jax.random.uniform(key, (R, n_samples), dtype=jnp.float32)

    pad_b = (-B) % 128
    wpad = jnp.pad(weights, ((0, 0), (0, pad_b)))
    bins_p = jnp.pad(bins, ((0, 0), (0, (-(B + 1)) % 128)), mode="edge")
    pad_n = (-n_samples) % 128
    u_p = jnp.pad(u, ((0, 0), (0, pad_n)))

    tile = min(_TILE_R, R)
    pad_r = (-R) % tile
    if pad_r:
        wpad = jnp.pad(wpad, ((0, pad_r), (0, 0)))
        bins_p = jnp.pad(bins_p, ((0, pad_r), (0, 0)), mode="edge")
        u_p = jnp.pad(u_p, ((0, pad_r), (0, 0)))

    out = _resample(bins_p, wpad, u_p, B, interpret)
    return out[:R, :n_samples]
