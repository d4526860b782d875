import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.cameras import generate_rays, ndc_rays
from oracle import oracle_generate_rays


def test_principal_point_ray():
    # ray through the image center equals the camera -z axis in world coords
    c2w = np.eye(4)[:3]
    H = W = 4
    focal = 2.0
    rays_o, rays_d = generate_rays(H, W, focal, c2w)
    # pixel (W/2, H/2) has dirs (0, 0, -1) exactly
    d = np.asarray(rays_d[H // 2, W // 2])
    np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)


def test_matches_oracle():
    rng = np.random.default_rng(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    c2w = np.concatenate([q, rng.normal(size=(3, 1))], axis=1)
    H, W, focal = 5, 7, 3.3
    got_o, got_d = generate_rays(H, W, focal, c2w)
    want_o, want_d = oracle_generate_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(got_o), want_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)


def test_ndc_bounds():
    # forward-facing rays map inside the NDC cube
    H = W = 8
    focal = 10.0
    c2w = np.eye(4)[:3]
    rays_o, rays_d = generate_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    no, nd = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    no, nd = np.asarray(no), np.asarray(nd)
    # origin z = 1 + 2*near/oz; at the near plane oz=-near → z = -1
    np.testing.assert_allclose(no[:, 2], -1.0, atol=1e-5)
    # t=1 endpoint reaches z = o2 + d2 = -1 + 2 = 1 (the far plane at infinity)
    np.testing.assert_allclose(no[:, 2] + nd[:, 2], 1.0, atol=1e-5)
    assert np.isfinite(no).all() and np.isfinite(nd).all()
