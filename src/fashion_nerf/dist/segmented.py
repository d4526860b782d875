"""segmented_ray_scan — the sequence/context-parallel ANALOG for NeRF
(SURVEY.md §2.4 "SP/CP" row, §5.7).

NeRF has no token sequence; the structural analog is samples-per-ray. The
transmittance product Tᵢ = ∏_{j<i}(1−αⱼ) decomposes across a "sp" mesh axis
exactly like blockwise/ring attention decomposes softmax: every chip
volume-renders its own SAMPLE SEGMENT locally, producing a partial
(rgb, depth, acc, log-transmittance-total), then an exclusive prefix over
the tiny per-segment summaries (jax.lax.associative_scan over the sp axis —
XLA lowers it to ICI collectives) rescales each segment's contribution:

    rgb = Σ_seg  T_before(seg) · rgb_seg ,  T_before = exp(prefix log T)

At the reference-specified 192 samples/ray this is never needed (VMEM fits
thousands of rays × samples); it exists for the scaling story and is tested
against the single-device renderer on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _segment_render(rgb, sigma, t_vals, dists):
    """Local volume render of one sample segment.

    Returns per-ray partials: (rgb_acc (R,3), depth_acc (R,), acc (R,),
    log_T_total (R,)) — everything needed to stitch segments."""
    density = jnp.maximum(sigma, 0.0)
    x = density * dists
    alpha = 1.0 - jnp.exp(-x)
    log_om = jnp.maximum(-x, -23.025851)
    log_T = jnp.cumsum(log_om, axis=-1) - log_om
    weights = alpha * jnp.exp(log_T)
    return (
        jnp.sum(weights[..., None] * rgb, axis=-2),
        jnp.sum(weights * t_vals, axis=-1),
        jnp.sum(weights, axis=-1),
        jnp.sum(log_om, axis=-1),
    )


def segmented_ray_scan(mesh: Mesh, rgb, sigma, t_vals, rays_d,
                       white_bkgd: bool = False, axis: str = "sp"):
    """Volume-render rays whose SAMPLE axis is sharded over `axis`.

    Args:
      mesh: a Mesh containing `axis` (reuse "tp" or a dedicated "sp" axis).
      rgb (R,S,3), sigma (R,S), t_vals (R,S): S sharded over `axis`.
      rays_d (R,3): replicated.

    Returns {"rgb", "depth", "acc"} — numerically equal to the unsharded
    volume_render (up to float reorder; the +1e-10 clamp is mirrored).
    """
    n_seg = mesh.shape[axis]
    R, S = sigma.shape
    assert S % n_seg == 0

    def local(rgb_s, sigma_s, t_s, t_next_first, rays_d_r, seg_idx):
        # δ within the segment; the segment's last interval reaches the NEXT
        # segment's first sample (the global last gets the infinite tail)
        dnorm = jnp.linalg.norm(rays_d_r, axis=-1, keepdims=True)
        d_in = t_s[:, 1:] - t_s[:, :-1]
        last = jnp.where(seg_idx == n_seg - 1,
                         jnp.full_like(t_s[:, :1], 1e10),
                         t_next_first - t_s[:, -1:])
        dists = jnp.concatenate([d_in, last], axis=1) * dnorm
        return _segment_render(rgb_s, sigma_s, t_s, dists)

    def fn(rgb_s, sigma_s, t_s, rays_d_r):
        seg_idx = jax.lax.axis_index(axis)
        # neighbor's first t (ring shift left); unused on the last segment
        t_first = t_s[:, :1]
        t_next_first = jax.lax.ppermute(
            t_first, axis,
            [(i, (i - 1) % n_seg) for i in range(n_seg)])
        rgb_p, depth_p, acc_p, logt_p = local(
            rgb_s, sigma_s, t_s, t_next_first, rays_d_r, seg_idx)

        # exclusive prefix of log-transmittance over segments: gather the
        # tiny per-segment totals and mask-sum the strictly-lower ones
        all_logt = jax.lax.all_gather(logt_p, axis)          # (n_seg, R)
        seg_ids = jnp.arange(n_seg)
        before = jnp.sum(
            jnp.where((seg_ids < seg_idx)[:, None], all_logt, 0.0), axis=0)
        t_before = jnp.exp(before)                            # (R,)

        rgb_c = rgb_p * t_before[:, None]
        depth_c = depth_p * t_before
        acc_c = acc_p * t_before
        # total = psum of rescaled contributions
        return (jax.lax.psum(rgb_c, axis),
                jax.lax.psum(depth_c, axis),
                jax.lax.psum(acc_c, axis))

    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P(None, axis),
                  P()),
        out_specs=(P(), P(), P()),
    )
    rgb_map, depth, acc = sharded(rgb, sigma, t_vals, rays_d)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    return {"rgb": rgb_map, "depth": depth, "acc": acc}
