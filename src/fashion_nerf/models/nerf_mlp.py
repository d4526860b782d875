"""Canonical NeRF MLP field in Flax (BASELINE.json:5 "coarse/fine MLP").

Architecture (canonical NeRF, [EXT] — reference@v1 has no code,
/root/reference/README.md:1-2): 8×256 ReLU trunk, skip-concat of γ(x) after
trunk layer `skips`, σ head off the trunk, RGB head off (feature ⊕ γ(d)).
"""

from __future__ import annotations

from typing import Tuple

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from fashion_nerf.config import ModelConfig
from fashion_nerf.core.posenc import posenc


class NeRFMLP(nn.Module):
    """Maps encoded position (and optionally encoded view dir + conditioning
    features) to raw (rgb, sigma)."""

    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    dtype: str = "float32"   # activation/matmul dtype; params stay float32

    @nn.compact
    def __call__(self, x_enc, d_enc=None, cond=None):
        """x_enc: (..., Cx) encoded positions; d_enc: (..., Cd) encoded dirs
        with the SAME leading batch shape as x_enc; cond: (..., Cc)
        conditioning features (garment/latent), same batch shape,
        concatenated to the trunk input.

        Returns (rgb_raw (...,3), sigma_raw (...,)).
        """
        dt = jnp.dtype(self.dtype)
        dense = functools.partial(nn.Dense, dtype=dt,
                                  param_dtype=jnp.float32)
        trunk_in = (x_enc if cond is None
                    else jnp.concatenate([x_enc, cond], axis=-1))
        trunk_in = trunk_in.astype(dt)
        h = trunk_in
        for i in range(self.depth):
            h = dense(self.width, name=f"trunk_{i}")(h)
            h = nn.relu(h)
            if i in self.skips and i + 1 < self.depth:
                h = jnp.concatenate([trunk_in, h], axis=-1)

        if self.use_viewdirs:
            sigma = dense(1, name="sigma_head")(h)[..., 0]
            feat = dense(self.width, name="feature")(h)
            assert d_enc is not None, "use_viewdirs=True requires d_enc"
            h2 = jnp.concatenate([feat, d_enc.astype(dt)], axis=-1)
            h2 = nn.relu(dense(self.width // 2, name="view_0")(h2))
            rgb = dense(3, name="rgb_head")(h2)
        else:
            out = dense(4, name="out_head")(h)
            rgb, sigma = out[..., :3], out[..., 3]
        # heads return f32 regardless of compute dtype (volume rendering and
        # losses run in f32)
        return rgb.astype(jnp.float32), sigma.astype(jnp.float32)


def make_field(mcfg: ModelConfig):
    """Build the XLA field function for a ModelConfig.

    Returns (module, field) where
      field(params, pts (R,S,3), viewdirs (R,3)|None, cond (R,Cc)|None)
        -> (rgb (R,S,3) post-sigmoid, sigma (R,S) raw).
    """
    module = NeRFMLP(depth=mcfg.net_depth, width=mcfg.net_width,
                     skips=mcfg.skips, use_viewdirs=mcfg.use_viewdirs,
                     dtype=mcfg.compute_dtype)

    def field(params, pts, viewdirs=None, cond=None):
        S = pts.shape[-2]
        x_enc = posenc(pts, mcfg.posenc_xyz)
        d_enc = None
        if mcfg.use_viewdirs:
            assert viewdirs is not None
            d_unit = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
            d_enc = posenc(d_unit, mcfg.posenc_dir)       # (R, Cd)
            d_enc = jnp.broadcast_to(d_enc[..., None, :],
                                     d_enc.shape[:-1] + (S, d_enc.shape[-1]))
        if cond is not None:
            cond = jnp.broadcast_to(cond[..., None, :],
                                    cond.shape[:-1] + (S, cond.shape[-1]))
        rgb_raw, sigma_raw = module.apply(params, x_enc, d_enc, cond)
        return jax.nn.sigmoid(rgb_raw), sigma_raw

    return module, field


def init_field(key, mcfg: ModelConfig, cond_dim: int = 0):
    """Initialize params with dummy shapes matching the field convention."""
    module = NeRFMLP(depth=mcfg.net_depth, width=mcfg.net_width,
                     skips=mcfg.skips, use_viewdirs=mcfg.use_viewdirs,
                     dtype=mcfg.compute_dtype)
    x_enc = jnp.zeros((1, 1, 3 * (2 * mcfg.posenc_xyz + 1)))
    d_enc = (jnp.zeros((1, 1, 3 * (2 * mcfg.posenc_dir + 1)))
             if mcfg.use_viewdirs else None)
    cond = jnp.zeros((1, 1, cond_dim)) if cond_dim else None
    return module.init(key, x_enc, d_enc, cond)


# SURVEY.md §2.1 inventory name
init_nerf_params = init_field
