"""Equivalence: kernels/resample_pallas.resample_cdf vs core.sampling
.sample_pdf (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.core.sampling import sample_pdf
from fashion_nerf.kernels.resample_pallas import resample_cdf


def _inputs(R=64, B=63, seed=0):
    rng = np.random.default_rng(seed)
    bins = jnp.asarray(np.sort(rng.uniform(2, 6, (R, B + 1)), -1)
                       .astype(np.float32))
    weights = jnp.asarray(rng.uniform(0, 1, (R, B)).astype(np.float32))
    return bins, weights


def _compare(det, R=64, B=63, N=128, interpret=True, seed=0):
    bins, weights = _inputs(R, B, seed)
    key = jax.random.PRNGKey(7)
    want = sample_pdf(key, bins, weights, N, det=det)
    got = resample_cdf(key, bins, weights, N, det=det, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)
    # samples stay inside the bin range
    g = np.asarray(got)
    assert (g >= np.asarray(bins[:, :1]) - 1e-4).all()
    assert (g <= np.asarray(bins[:, -1:]) + 1e-4).all()


def test_resample_det_interpret():
    _compare(det=True)


def test_resample_random_interpret():
    _compare(det=False)


def test_resample_ragged_interpret():
    _compare(det=True, R=37, B=31, N=96, seed=3)


def test_resample_concentrated_interpret():
    # all mass in one bin → all samples inside that bin
    R, B, N = 16, 63, 64
    bins = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, B + 1, dtype=jnp.float32), (R, B + 1))
    weights = jnp.zeros((R, B)).at[:, 10].set(1.0)
    got = np.asarray(resample_cdf(jax.random.PRNGKey(0), bins, weights, N,
                                  det=False, interpret=True))
    lo, hi = float(bins[0, 10]), float(bins[0, 11])
    frac = ((got >= lo - 1e-3) & (got <= hi + 1e-3)).mean()
    assert frac > 0.95


@pytest.mark.tpu
def test_resample_tpu():
    _compare(det=True, R=1024, B=63, N=128, interpret=False)
    _compare(det=False, R=1024, B=63, N=128, interpret=False, seed=5)
