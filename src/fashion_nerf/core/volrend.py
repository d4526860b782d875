"""Quadrature volume rendering — the alpha-compositing weighted scan.

BASELINE.json:5: "alpha-compositing volume rendering becomes a single fused
weighted scan instead of a host-side Python loop". This module is the L0 XLA
composition (cumprod is one fused op under XLA already); the Pallas twin that
keeps per-ray tiles VMEM-resident is kernels/render_pallas.fused_render_rays.

Math: δᵢ = (tᵢ₊₁ − tᵢ)·‖d‖;  αᵢ = 1 − exp(−σᵢδᵢ);  Tᵢ = ∏_{j<i}(1 − αⱼ);
wᵢ = Tᵢαᵢ;  C = Σwᵢcᵢ;  depth = Σwᵢtᵢ;  acc = Σwᵢ; white bkgd: C + (1 − acc).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_INF_DIST = 1e10


def volume_render(rgb, sigma, t_vals, rays_d, white_bkgd: bool = False,
                  raw_noise_std: float = 0.0, key: Optional[jax.Array] = None,
                  sigma_activation: str = "relu", t_end=None):
    """Composite per-sample (rgb, σ) into per-ray outputs.

    Args:
      rgb: (R, S, 3) post-sigmoid colors.
      sigma: (R, S) raw (pre-activation) density.
      t_vals: (R, S) sample depths.
      rays_d: (R, 3) unnormalized ray directions (norm scales δ → metric depth).
      white_bkgd: composite onto white.
      raw_noise_std: σ-pre-activation Gaussian noise (training regularizer).
      key: PRNG key, required iff raw_noise_std > 0.
      sigma_activation: relu | softplus.
      t_end: None → canonical NeRF infinite last interval (trailing density
        absorbs everything). Scalar or (R,) → finite integration bound: the
        last sample's interval is t_end − t_vals[:, -1]. The occupancy-culled
        path requires this: its last sample sits at the box EXIT where σ is
        small but nonzero (≤ the grid threshold by construction), and σ·∞
        would saturate α and bleed surface color into through-rays.

    Returns dict: rgb (R,3), depth (R,), acc (R,), weights (R,S), disp (R,).
    """
    dists = t_vals[:, 1:] - t_vals[:, :-1]                         # (R, S-1)
    if t_end is None:
        last = jnp.full_like(t_vals[:, :1], _INF_DIST)
    else:
        t_end = jnp.broadcast_to(jnp.asarray(t_end, t_vals.dtype),
                                 (t_vals.shape[0],))
        last = jnp.maximum(t_end[:, None] - t_vals[:, -1:], 0.0)
    # pad shape must come from t_vals, not dists — at S=1 dists is (R, 0) and
    # full_like(dists[:, :1]) would silently drop the last interval
    dists = jnp.concatenate([dists, last], axis=-1)                # (R, S)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if raw_noise_std > 0.0:
        assert key is not None, "raw_noise_std>0 requires a PRNG key"
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std

    if sigma_activation == "softplus":
        density = jax.nn.softplus(sigma)
    else:
        density = jax.nn.relu(sigma)

    alpha = 1.0 - jnp.exp(-density * dists)                        # (R, S)
    # exclusive cumprod of (1-α): T_i = prod_{j<i}(1-α_j)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]],
                            axis=-1)
    weights = alpha * trans                                        # (R, S)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)           # (R, 3)
    depth_map = jnp.sum(weights * t_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb": rgb_map,
        "depth": depth_map,
        "acc": acc_map,
        "weights": weights,
        "disp": disp_map,
    }
