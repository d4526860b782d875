"""TPU-native substrate #2 (SURVEY.md §2.1): fused inverse-CDF resampling.

BASELINE.json:5 — "hierarchical importance sampling … fuse into Pallas
kernels". Per ray tile, entirely in VMEM: weight normalization, the CDF
prefix-sum (triangular matmul — no cumsum lowering on Mosaic), and the
inverse-CDF lookup as a STATIC unrolled bin sweep of elementwise
select/max/min updates (TPU has no per-row dynamic gather worth using;
monotone cdf/bins make "last bin with cdf ≤ u" a running select —
SURVEY.md §7 hard-part 1's fixed-size-network answer).

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

_TILE_R = 128   # the unrolled bin sweep keeps several (T, N) f32 live
                # ranges; 512 rows hit 28 MB of the 16 MB VMEM budget
_NEG, _POS = -1e10, 1e10


def _resample_kernel(bins_ref, wpad_ref, u_ref, tri_ref, out_ref,
                     *, n_bins: int, eps: float):
    w = wpad_ref[:]                                  # (T, Bp) zero-padded
    wsum = jnp.sum(w, axis=1, keepdims=True) + eps * n_bins
    pdf = (w + eps) / wsum                           # pad lanes add eps/wsum
    # prefix sum over REAL bins only: tri is zero in pad rows/cols
    cdf_in = jnp.dot(pdf, tri_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # inclusive (T,Bp)

    u = u_ref[:]                                     # (T, N)
    cb = jnp.zeros_like(u)                           # cdf[0] = 0 qualifies
    bb = jnp.broadcast_to(bins_ref[:, 0:1], u.shape)
    ca = jnp.full_like(u, _POS)
    ba = jnp.full_like(u, _POS)
    # edge 0 (cdf=0) handled by init; sweep edges 1..B (inclusive cdf cols)
    for b in range(n_bins):
        c = cdf_in[:, b:b + 1]                       # cdf edge b+1
        bin_b = bins_ref[:, b + 1:b + 2]
        le = c <= u
        cb = jnp.where(le, c, cb)                    # monotone → last wins
        bb = jnp.where(le, bin_b, bb)
        first_gt = (~le) & (ca >= _POS * 0.5)
        ca = jnp.where(first_gt, c, ca)
        ba = jnp.where(first_gt, bin_b, ba)
    # u beyond the last edge → clamp to it
    last_c = cdf_in[:, n_bins - 1:n_bins]
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
