"""Garment-conditioned radiance field — BASELINE.json:10.

GarmentEncoder: a small strided conv net over the (H, W, 7) conditioning
stack (warped cloth, masks, pose raster — tryon/pipeline.py) → one global
feature vector, broadcast to every ray of the scene. The conditioned field
itself IS the standard NeRFMLP: models/nerf_mlp.py accepts `cond` natively
and concatenates it into the trunk input, so no wrapper class exists —
train/loop.py's _make_cond/_eval_cond assemble the code and hand it through
the one field convention (SURVEY.md §2.1 "models/conditioned.py" row).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GarmentEncoder(nn.Module):
    """(B, H, W, C) conditioning stack → (B, out_dim) garment code."""

    out_dim: int = 64
    features: tuple = (16, 32, 64)

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), strides=(2, 2), name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                     # global pool
        x = nn.Dense(self.out_dim, name="proj")(x)
        return x


def encode_garment(params, cond_stack, encoder: GarmentEncoder):
    """cond_stack (H, W, C) or (B, H, W, C) → (out_dim,) / (B, out_dim)."""
    single = cond_stack.ndim == 3
    x = cond_stack[None] if single else cond_stack
    out = encoder.apply(params, x)
    return out[0] if single else out
