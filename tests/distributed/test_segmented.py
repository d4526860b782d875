"""segmented_ray_scan (SP/CP analog) vs the single-device volume renderer
on the virtual CPU mesh (SURVEY.md §2.4/§5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fashion_nerf.core.volrend import volume_render
from fashion_nerf.dist.segmented import segmented_ray_scan


def _mesh(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return Mesh(np.array(devs[:n]), ("sp",))


@pytest.mark.parametrize("n_seg", [2, 4, 8])
def test_matches_single_device(n_seg):
    mesh = _mesh(n_seg)
    rng = np.random.default_rng(0)
    R, S = 16, 64
    rgb = jnp.asarray(rng.uniform(0, 1, (R, S, 3)).astype(np.float32))
    sigma = jnp.asarray(rng.normal(0.5, 2.0, (R, S)).astype(np.float32))
    t = jnp.asarray(np.sort(rng.uniform(2, 6, (R, S)), -1)
                    .astype(np.float32))
    d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))

    ref = volume_render(rgb, sigma, t, d, white_bkgd=True)
    got = segmented_ray_scan(mesh, rgb, sigma, t, d, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(got["acc"]),
                               np.asarray(ref["acc"]), atol=3e-4)


def test_opaque_wall_crossing_segments():
    """A wall in segment 0 must zero later segments' contributions."""
    mesh = _mesh(4)
    R, S = 4, 32
    rgb = jnp.broadcast_to(jnp.array([0.2, 0.9, 0.4]), (R, S, 3))
    sigma = jnp.full((R, S), -100.0).at[:, 3].set(1e6)
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (R, 3))
    got = segmented_ray_scan(mesh, rgb, sigma, t, d)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               float(t[0, 3]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.broadcast_to([0.2, 0.9, 0.4], (R, 3)),
                               atol=1e-4)
