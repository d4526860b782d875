"""Garment-conditioned radiance field — BASELINE.json:10.

GarmentEncoder: a small strided conv net over the (H, W, 7) conditioning
stack (warped cloth, masks, pose raster — tryon/pipeline.py) → one global
feature vector, broadcast to every ray of the scene. ConditionedNeRF is the
standard NeRFMLP with that feature concatenated into the trunk input
(models/nerf_mlp.py already accepts `cond`); this module owns the encoder
and the glue.
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


class ConditionedNeRF:
    """SURVEY.md §2.1 row "models/conditioned.py": the garment-conditioned
    field = NeRFMLP with the garment code concatenated into the trunk input
    (NeRFMLP handles `cond` natively). This wrapper packages encoder + field
    under the inventory name."""

    def __init__(self, mcfg, encoder: GarmentEncoder | None = None):
        from fashion_nerf.models.nerf_mlp import make_field
        self.encoder = encoder or GarmentEncoder(out_dim=mcfg.condition_dim)
        self.module, self._field = make_field(mcfg)

    def __call__(self, params, pts, viewdirs, cond_stack, encoder_params):
        code = encode_garment(encoder_params, cond_stack, self.encoder)
        cond = jnp.broadcast_to(code, (pts.shape[0], code.shape[-1]))
        return self._field(params, pts, viewdirs, cond)
