"""Equivalence: kernels/render_pallas.fused_render_rays vs core.volrend
(SURVEY.md §4.3). Interpreter mode on CPU; compiled on TPU via marker."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.core.volrend import volume_render
from fashion_nerf.kernels.render_pallas import fused_render_rays


def _inputs(R=64, S=48, seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.uniform(0, 1, (R, S, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.normal(0.5, 2.0, (R, S)).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(2, 6, (R, S)), -1)
                    .astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    return rgb, sigma, t, d


def _compare(interpret, white_bkgd=False, softplus=False, R=64, S=48):
    rgb, sigma, t, d = _inputs(R, S)
    act = "softplus" if softplus else "relu"
    ref = volume_render(rgb, sigma, t, d, white_bkgd=white_bkgd,
                        sigma_activation=act)
    got = fused_render_rays(rgb, sigma, t, d, white_bkgd=white_bkgd,
                            sigma_activation=act, interpret=interpret)
    for k in ("rgb", "depth", "acc", "weights", "disp"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=1e-3, err_msg=k)


def test_fused_volrend_interpret():
    _compare(interpret=True)


def test_fused_volrend_white_softplus_interpret():
    _compare(interpret=True, white_bkgd=True, softplus=True)


def test_fused_volrend_ragged_rays_interpret():
    # R not a multiple of the tile → padding path
    _compare(interpret=True, R=37, S=16)


def test_noise_parity_interpret():
    rgb, sigma, t, d = _inputs()
    key = jax.random.PRNGKey(3)
    ref = volume_render(rgb, sigma, t, d, raw_noise_std=1.0, key=key)
    got = fused_render_rays(rgb, sigma, t, d, raw_noise_std=1.0, key=key,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-4)


@pytest.mark.tpu
def test_fused_volrend_tpu():
    _compare(interpret=False, white_bkgd=True, R=512, S=192)
