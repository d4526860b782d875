"""Golden test #2: the FULL hierarchical pipeline (stratified → coarse
field with viewdirs → volume render → inverse-CDF resample → union sort →
fine field → render) vs a from-scratch NumPy implementation sharing only the
trained weights (SURVEY.md §4.2)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.config import load_config
from fashion_nerf.models.nerf_mlp import init_field, make_field
from fashion_nerf.render.renderer import render_rays
from oracle import (oracle_generate_rays, oracle_posenc, oracle_sample_pdf,
                    oracle_volume_render)

_OVR = ["sampling.n_coarse=8", "sampling.n_fine=8", "model.net_depth=3",
        "model.net_width=16", "model.posenc_xyz=2", "model.posenc_dir=2",
        "render.white_bkgd=true", "model.compute_dtype=float32",
        "kernels.use_pallas=false"]


def _np_field(params, pts, dirs, mcfg):
    """NumPy twin of the viewdirs NeRFMLP (f64)."""
    p = params["params"]

    def lin(name, h):
        return (h @ np.asarray(p[name]["kernel"], np.float64)
                + np.asarray(p[name]["bias"], np.float64))

    x_enc = oracle_posenc(pts, mcfg.posenc_xyz)
    h = x_enc
    for i in range(mcfg.net_depth):
        h = np.maximum(lin(f"trunk_{i}", h), 0.0)
        if i in mcfg.skips and i + 1 < mcfg.net_depth:
            h = np.concatenate([x_enc, h], axis=-1)
    sigma = lin("sigma_head", h)[..., 0]
    feat = lin("feature", h)
    d_unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    d_enc = oracle_posenc(d_unit, mcfg.posenc_dir)
    d_enc = np.broadcast_to(d_enc[:, None, :],
                            feat.shape[:-1] + (d_enc.shape[-1],))
    h2 = np.maximum(lin("view_0", np.concatenate([feat, d_enc], -1)), 0.0)
    rgb = 1.0 / (1.0 + np.exp(-lin("rgb_head", h2)))
    return rgb, sigma


def test_hierarchical_pipeline_matches_oracle():
    cfg = load_config("blender_lego", _OVR)
    mcfg = cfg.model
    params = init_field(jax.random.PRNGKey(0), mcfg)
    _, field = make_field(mcfg)

    H = W = 3
    focal = 2.5
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    ro_np, rd_np = oracle_generate_rays(H, W, focal, c2w)
    ro = jnp.asarray(ro_np.reshape(-1, 3), jnp.float32)
    rd = jnp.asarray(rd_np.reshape(-1, 3), jnp.float32)

    fc = functools.partial(field, params)
    out = render_rays(fc, fc, ro, rd, jax.random.PRNGKey(1), cfg,
                      train=False)
    got = np.asarray(out["fine"]["rgb"])

    # --- NumPy path (deterministic eval mode) ---
    R = ro.shape[0]
    ro64 = ro_np.reshape(-1, 3)
    rd64 = rd_np.reshape(-1, 3)
    t_c = np.tile(np.linspace(2.0, 6.0, 8), (R, 1))
    pts_c = ro64[:, None] + rd64[:, None] * t_c[..., None]
    rgb_c, sig_c = _np_field(params, pts_c, rd64, mcfg)
    _, _, _, w_c = oracle_volume_render(rgb_c, sig_c, t_c, rd64,
                                        white_bkgd=True)
    t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
    u = np.tile(np.linspace(0, 1, 8), (R, 1))
    t_f = oracle_sample_pdf(t_mid, w_c[:, 1:-1], u)
    t_all = np.sort(np.concatenate([t_c, t_f], -1), -1)
    pts_f = ro64[:, None] + rd64[:, None] * t_all[..., None]
    rgb_f, sig_f = _np_field(params, pts_f, rd64, mcfg)
    want, _, acc, _ = oracle_volume_render(rgb_f, sig_f, t_all, rd64)
    want = want + (1.0 - acc[:, None])            # white background

    np.testing.assert_allclose(got, want, atol=5e-5)
