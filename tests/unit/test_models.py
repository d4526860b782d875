import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.config import ModelConfig
from fashion_nerf.models.nerf_mlp import NeRFMLP, init_field, make_field
from fashion_nerf.models.latents import LatentTable


def test_init_and_apply_shapes():
    mcfg = ModelConfig()
    params = init_field(jax.random.PRNGKey(0), mcfg)
    _, field = make_field(mcfg)
    pts = jnp.zeros((4, 8, 3))
    dirs = jnp.ones((4, 3))
    rgb, sigma = field(params, pts, dirs)
    assert rgb.shape == (4, 8, 3)
    assert sigma.shape == (4, 8)
    assert ((rgb >= 0) & (rgb <= 1)).all()  # post-sigmoid


def test_no_viewdirs_variant():
    mcfg = ModelConfig(use_viewdirs=False, posenc_xyz=6)
    params = init_field(jax.random.PRNGKey(0), mcfg)
    _, field = make_field(mcfg)
    rgb, sigma = field(params, jnp.zeros((2, 4, 3)))
    assert rgb.shape == (2, 4, 3) and sigma.shape == (2, 4)


def test_param_count_canonical():
    # canonical NeRF trunk: 8×256 with skip at 4 → known weight shapes
    mcfg = ModelConfig()
    params = init_field(jax.random.PRNGKey(0), mcfg)
    p = params["params"]
    assert p["trunk_0"]["kernel"].shape == (63, 256)
    assert p["trunk_5"]["kernel"].shape == (63 + 256, 256)  # post-skip layer
    assert p["trunk_4"]["kernel"].shape == (256, 256)
    assert p["sigma_head"]["kernel"].shape == (256, 1)
    assert p["view_0"]["kernel"].shape == (256 + 27, 128)
    assert p["rgb_head"]["kernel"].shape == (128, 3)


def test_viewdirs_affect_rgb_not_sigma():
    mcfg = ModelConfig()
    params = init_field(jax.random.PRNGKey(1), mcfg)
    _, field = make_field(mcfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 3))
    d1 = jnp.array([[1.0, 0, 0]] * 3)
    d2 = jnp.array([[0, 1.0, 0]] * 3)
    rgb1, s1 = field(params, pts, d1)
    rgb2, s2 = field(params, pts, d2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))


def test_conditioning_changes_output():
    mcfg = ModelConfig(conditioned=True, condition_dim=8)
    params = init_field(jax.random.PRNGKey(0), mcfg, cond_dim=8)
    _, field = make_field(mcfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3))
    dirs = jnp.ones((2, 3))
    c1 = jnp.zeros((2, 8))
    c2 = jnp.ones((2, 8))
    rgb1, s1 = field(params, pts, dirs, c1)
    rgb2, s2 = field(params, pts, dirs, c2)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_latent_table():
    table = LatentTable(n_frames=10, dim=4)
    params = table.init(jax.random.PRNGKey(0), jnp.zeros((3,), jnp.int32))
    out = table.apply(params, jnp.array([0, 3, 9]))
    assert out.shape == (3, 4)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
