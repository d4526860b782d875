"""TPU-native substrate #1 (SURVEY.md §2.1): fused ray-march compositing.

BASELINE.json:5 — "alpha-compositing volume rendering becomes a single fused
weighted scan". One pallas_call per ray tile computes δ, α, the exclusive
transmittance scan, and all weighted reductions (rgb/depth/acc) with the
(rays × samples) tile resident in VMEM.

Scan: exclusive prefix sum of log(1−α) along the sample (lane) axis via a
strict-upper-triangular matmul on the MXU (jnp.cumsum has no Mosaic
lowering). The contraction is safe because the wrapper pads the sample axis
to a full 128-lane multiple with σ→−1e10 (zero density ⇒ log(1−α)=0) BEFORE
the pallas_call — the matmul therefore never reads uninitialized physical
padding lanes (which are NaN canaries in interpret mode, garbage on
hardware). This block-carry structure is also the §5.7 long-ray story:
> VMEM sample counts would chain these tiles with a carried
(acc_rgb, log_T) pair.

Color layout: rgb arrives transposed as (R, 3, S) — a (R, S, 3) block would
pad 3 lanes to 128 and waste 42× VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256     # rays per program
_INF_DIST = 1e10


def _render_kernel(rgb_ref, sigma_ref, t_ref, dnorm_ref, tri_ref,
                   rgb_out_ref, depth_ref, acc_ref, weights_ref,
                   *, white_bkgd: bool, softplus: bool):
    t = t_ref[:]                                    # (T, S)
    sigma = sigma_ref[:]                            # (T, S)
    dnorm = dnorm_ref[:]                            # (T, 1)
    S = t.shape[1]

    dists = jnp.concatenate(
        [t[:, 1:] - t[:, :-1], jnp.full_like(t[:, :1], _INF_DIST)], axis=1)
    dists = dists * dnorm
    if softplus:
        density = jax.nn.softplus(sigma)
    else:
        density = jnp.maximum(sigma, 0.0)
    x = density * dists
    alpha = 1.0 - jnp.exp(-x)                       # (T, S)
    # log(1-α) = -x analytically — computing log(1-α+1e-10) in-kernel
    # reassociates to (1+1e-10)-α = 0 at opaque samples → -inf → NaN in the
    # scan. The -23.03 floor mirrors core.volrend's +1e-10 clamp.
    log_om = jnp.maximum(-x, -23.025851)
    # exclusive scan via strict-lower-triangular matmul on the MXU
    # (cumsum has no Mosaic lowering; S is padded to lane multiples by the
    # wrapper so the contraction reads no uninitialized lanes)
    # HIGHEST: bf16-pass matmul loses ~1e-3 relative on the ~-23 log values,
    # which exp() amplifies into visible weight error; the matmul is tiny
    log_T = jnp.dot(log_om, tri_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (T, S)
    weights = alpha * jnp.exp(log_T)

    rgb = rgb_ref[:]                                # (T, 3, S)
    wsum = jnp.sum(weights, axis=1, keepdims=True)  # (T, 1)
    rgb_map = jnp.sum(rgb * weights[:, None, :], axis=-1)   # (T, 3)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - wsum)
    depth = jnp.sum(weights * t, axis=1, keepdims=True)

    rgb_out_ref[:] = rgb_map
    depth_ref[:] = depth
    acc_ref[:] = wsum
    weights_ref[:] = weights


@functools.partial(
    jax.jit, static_argnames=("white_bkgd", "softplus", "interpret"))
def _fused_volrend(rgb_t, sigma, t_vals, dnorm, white_bkgd: bool,
                   softplus: bool, interpret: bool):
    R, S = sigma.shape
    tile = min(_TILE_R, R)
    assert R % tile == 0, (R, tile)
    assert S % 128 == 0, S
    grid = (R // tile,)
    tri = jnp.asarray(np.triu(np.ones((S, S), np.float32), k=1))

    out = pl.pallas_call(
        functools.partial(_render_kernel, white_bkgd=white_bkgd,
                          softplus=softplus),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, S), jnp.float32),
        ),
        interpret=interpret,
    )(rgb_t, sigma, t_vals, dnorm, tri)
    return out


def fused_render_rays(rgb, sigma, t_vals, rays_d, white_bkgd: bool = False,
                      raw_noise_std: float = 0.0,
                      key: Optional[jax.Array] = None,
                      sigma_activation: str = "relu",
                      interpret: bool = False):
    """Drop-in twin of core.volrend.volume_render (same signature/returns).

    σ-noise is applied in XLA before the kernel (cheap elementwise); the
    scan + reductions run fused in VMEM. Differentiable: custom VJP
    recomputes through core.volrend (same math, autodiff-friendly), so the
    kernel is usable inside the jitted train step.
    """
    R, S = sigma.shape
    if raw_noise_std > 0.0:
        assert key is not None
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std
    return _fused_render_core(rgb, sigma, t_vals, rays_d, white_bkgd,
                              sigma_activation, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_render_core(rgb, sigma, t_vals, rays_d, white_bkgd,
                       sigma_activation, interpret):
    return _fused_render_fwd_impl(rgb, sigma, t_vals, rays_d, white_bkgd,
                                  sigma_activation, interpret)


def _fused_render_fwd(rgb, sigma, t_vals, rays_d, white_bkgd,
                      sigma_activation, interpret):
    out = _fused_render_fwd_impl(rgb, sigma, t_vals, rays_d, white_bkgd,
                                 sigma_activation, interpret)
    return out, (rgb, sigma, t_vals, rays_d)


def _fused_render_bwd(white_bkgd, sigma_activation, interpret, res, g):
    from fashion_nerf.core.volrend import volume_render
    rgb, sigma, t_vals, rays_d = res
    _, vjp = jax.vjp(
        lambda r, s, t, d: volume_render(
            r, s, t, d, white_bkgd=white_bkgd,
            sigma_activation=sigma_activation),
        rgb, sigma, t_vals, rays_d)
    return vjp(g)


_fused_render_core.defvjp(_fused_render_fwd, _fused_render_bwd)


def _fused_render_fwd_impl(rgb, sigma, t_vals, rays_d, white_bkgd,
                           sigma_activation, interpret):
    R, S = sigma.shape

    rgb_t = jnp.transpose(rgb, (0, 2, 1))            # (R, 3, S)
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    # Pad the SAMPLE axis to a full 128-lane multiple: lane-axis ops inside
    # the kernel (cumsum) otherwise touch uninitialized physical padding
    # lanes (NaN canaries in interpret mode, garbage on hardware). Padding:
    # σ→-1e10 (zero density), t continues monotone with a 1e10 jump so the
    # last REAL sample keeps its infinite final interval.
    pad_s = (-S) % 128
    if pad_s:
        rgb_t = jnp.pad(rgb_t, ((0, 0), (0, 0), (0, pad_s)))
        sigma = jnp.pad(sigma, ((0, 0), (0, pad_s)),
                        constant_values=-1e10)
        t_ext = (t_vals[:, -1:]
                 + _INF_DIST * jnp.arange(1, pad_s + 1, dtype=t_vals.dtype))
        t_vals = jnp.concatenate([t_vals, t_ext], axis=1)

    pad = (-R) % min(_TILE_R, max(R, 1))
    if pad:
        rgb_t = jnp.pad(rgb_t, ((0, pad), (0, 0), (0, 0)))
        sigma = jnp.pad(sigma, ((0, pad), (0, 0)), constant_values=-1e10)
        t_vals = jnp.pad(t_vals, ((0, pad), (0, 0)), constant_values=1.0)
        dnorm = jnp.pad(dnorm, ((0, pad), (0, 0)), constant_values=1.0)

    rgb_map, depth, acc, weights = _fused_volrend(
        rgb_t, sigma, t_vals, dnorm, white_bkgd,
        sigma_activation == "softplus", interpret)
    rgb_map, depth = rgb_map[:R], depth[:R, 0]
    acc, weights = acc[:R, 0], weights[:R, :S]
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb": rgb_map, "depth": depth, "acc": acc,
            "weights": weights, "disp": disp}
