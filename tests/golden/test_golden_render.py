"""Golden test: the full JAX render pipeline vs the NumPy oracle with the
SAME tiny MLP weights (SURVEY.md §4.2). Substitutes for bit-parity against
the absent PyTorch reference."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.config import load_config
from fashion_nerf.core.posenc import posenc_dim
from fashion_nerf.models.nerf_mlp import init_field, make_field
from fashion_nerf.render.renderer import render_rays
from oracle import (oracle_generate_rays, oracle_mlp, oracle_posenc,
                    oracle_volume_render)


def _flax_to_numpy_layers(params, depth):
    p = params["params"]
    layers = [(np.asarray(p[f"trunk_{i}"]["kernel"], np.float64),
               np.asarray(p[f"trunk_{i}"]["bias"], np.float64))
              for i in range(depth)]
    out = (np.asarray(p["out_head"]["kernel"], np.float64),
           np.asarray(p["out_head"]["bias"], np.float64))
    return layers, out


def test_coarse_pipeline_matches_oracle():
    cfg = load_config("tiny_lego", ["sampling.n_coarse=8",
                                    "model.net_depth=3",
                                    "model.net_width=16",
                                    "model.posenc_xyz=2",
                                    "render.white_bkgd=false"])
    mcfg = cfg.model
    params = init_field(jax.random.PRNGKey(0), mcfg)
    _, field = make_field(mcfg)

    H = W = 4
    focal = 3.0
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0

    rays_o_np, rays_d_np = oracle_generate_rays(H, W, focal, c2w)
    rays_o = jnp.asarray(rays_o_np.reshape(-1, 3), jnp.float32)
    rays_d = jnp.asarray(rays_d_np.reshape(-1, 3), jnp.float32)

    fc = functools.partial(field, params)
    out = render_rays(fc, None, rays_o, rays_d,
                      jax.random.PRNGKey(1), cfg, train=False)
    got = np.asarray(out["coarse"]["rgb"])

    # --- oracle path ---
    R = rays_o.shape[0]
    t = np.linspace(2.0, 6.0, 8)                    # deterministic stratified
    t_np = np.tile(t, (R, 1))
    pts = (rays_o_np.reshape(-1, 1, 3)
           + rays_d_np.reshape(-1, 1, 3) * t_np[..., None])
    x_enc = oracle_posenc(pts, mcfg.posenc_xyz)
    layers, out_head = _flax_to_numpy_layers(params, mcfg.net_depth)
    # trunk with relu between layers, then linear out head (no skip at depth 3)
    h = x_enc
    for Wm, b in layers:
        h = np.maximum(h @ Wm + b, 0.0)
    raw = h @ out_head[0] + out_head[1]
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = raw[..., 3]
    want, _, _, _ = oracle_volume_render(rgb, sigma, t_np,
                                         rays_d_np.reshape(-1, 3))
    np.testing.assert_allclose(got, want, atol=2e-5)
