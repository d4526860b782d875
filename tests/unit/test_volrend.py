import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.volrend import volume_render
from oracle import oracle_volume_render


def _rand_inputs(rng, R=6, S=16):
    rgb = rng.uniform(0, 1, size=(R, S, 3)).astype(np.float32)
    sigma = rng.normal(1.0, 2.0, size=(R, S)).astype(np.float32)
    t = np.sort(rng.uniform(2, 6, size=(R, S)), axis=-1).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    return rgb, sigma, t, d


def test_matches_oracle():
    rng = np.random.default_rng(0)
    rgb, sigma, t, d = _rand_inputs(rng)
    out = volume_render(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t),
                        jnp.asarray(d))
    w_rgb, w_depth, w_acc, w_w = oracle_volume_render(rgb, sigma, t, d)
    np.testing.assert_allclose(np.asarray(out["rgb"]), w_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), w_depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["acc"]), w_acc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), w_w, atol=1e-4)


def test_weight_conservation():
    rng = np.random.default_rng(1)
    rgb, sigma, t, d = _rand_inputs(rng)
    out = volume_render(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t),
                        jnp.asarray(d))
    w = np.asarray(out["weights"])
    acc = np.asarray(out["acc"])
    assert (acc <= 1.0 + 1e-5).all()
    np.testing.assert_allclose(w.sum(-1), acc, atol=1e-5)


def test_opaque_wall_depth():
    # huge σ at sample k → depth = t_k, rgb = color_k
    R, S = 2, 8
    rgb = np.zeros((R, S, 3), np.float32)
    rgb[:, 3] = [1.0, 0.5, 0.25]
    sigma = np.full((R, S), -100.0, np.float32)  # relu → 0 density
    sigma[:, 3] = 1e6
    t = np.tile(np.linspace(2, 6, S, dtype=np.float32), (R, 1))
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (R, 1))
    out = volume_render(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t),
                        jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out["depth"]), t[:, 3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.tile([[1.0, 0.5, 0.25]], (R, 1)), atol=1e-4)


def test_empty_space_white_bkgd():
    R, S = 2, 8
    rgb = np.random.default_rng(2).uniform(size=(R, S, 3)).astype(np.float32)
    sigma = np.full((R, S), -10.0, np.float32)  # zero density after relu
    t = np.tile(np.linspace(2, 6, S, dtype=np.float32), (R, 1))
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (R, 1))
    out = volume_render(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t),
                        jnp.asarray(d), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-5)


def test_noise_only_with_key():
    rng = np.random.default_rng(3)
    rgb, sigma, t, d = _rand_inputs(rng, R=2, S=4)
    args = (jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(d))
    a = volume_render(*args, raw_noise_std=1.0, key=jax.random.PRNGKey(0))
    b = volume_render(*args, raw_noise_std=0.0)
    assert not np.allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]))
