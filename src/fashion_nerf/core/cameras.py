"""Camera model: pixel grid → world-space rays; NDC reparameterization.

Capability contract: BASELINE.json:5 "ray generation"; BASELINE.json:9 "NDC ray
parameterization" (reference@v1 ships no code — /root/reference/README.md:1-2).

Convention (matches the canonical NeRF camera model): the camera looks down
its -z axis, +x right, +y up; `c2w` is a 3×4 (or 4×4) camera-to-world matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_rays(H: int, W: int, focal, c2w):
    """All rays through a pixel grid.

    Args:
      H, W: image size (static Python ints).
      focal: focal length in pixels (scalar).
      c2w: (3,4) or (4,4) camera-to-world.

    Returns:
      rays_o, rays_d: each (H, W, 3). Directions are NOT normalized (δ scaling
      in volume rendering multiplies by ‖d‖, preserving metric depth).
    """
    c2w = jnp.asarray(c2w)
    i = jnp.arange(W, dtype=jnp.float32)
    j = jnp.arange(H, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(i, j, indexing="xy")  # (H, W)
    dirs = jnp.stack(
        [
            (ii - W * 0.5) / focal,
            -(jj - H * 0.5) / focal,
            -jnp.ones_like(ii),
        ],
        axis=-1,
    )  # (H, W, 3) in camera space
    # rotate to world: sum_k dirs[...,k] * R[:,k]. HIGHEST precision: this is
    # a tiny once-per-image op, and bf16 MXU rounding here would bias every
    # downstream sample position.
    rays_d = jnp.einsum("hwk,ik->hwi", dirs, c2w[:3, :3],
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal, near, rays_o, rays_d):
    """Shift rays to the z=-near plane and map to NDC space.

    Standard forward-facing (LLFF) reparameterization: after this transform the
    scene lies in the unit cube with depth ∈ [0, 1] sampled linearly, so
    near/far become 0/1 (config llff_fern in config.py).
    """
    # shift origins to the near plane
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (-1.0 / (W / (2.0 * focal))
          * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]))
    d1 = (-1.0 / (H / (2.0 * focal))
          * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]))
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
