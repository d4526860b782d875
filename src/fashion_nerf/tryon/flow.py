"""Dense appearance-flow cloth warp (HR-VITON-style) — BASELINE.json:5.

A (H, W, 2) flow field gives per-output-pixel source offsets; backward warp
via the same bilinear grid_sample as the TPS path.
"""

from __future__ import annotations

import jax.numpy as jnp

from fashion_nerf.tryon.tps import grid_sample


def flow_warp(img, flow, padding_value: float = 0.0,
              normalized: bool = True):
    """Backward-warp img (H, W, C) by flow (Ho, Wo, 2).

    flow holds (dx, dy) offsets — in [-1,1]-normalized units when
    `normalized`, else in pixels. Output pixel o reads source position
    o + flow[o].
    """
    Ho, Wo = flow.shape[:2]
    ys = jnp.linspace(-1.0, 1.0, Ho)
    xs = jnp.linspace(-1.0, 1.0, Wo)
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx, gy], axis=-1)                  # (Ho, Wo, 2)
    if not normalized:
        H, W = img.shape[:2]
        scale = jnp.array([2.0 / max(W - 1, 1), 2.0 / max(H - 1, 1)])
        flow = flow * scale
    return grid_sample(img, base + flow, padding_value)
