import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.sampling import sample_pdf, stratified_sample
from oracle import oracle_sample_pdf


def test_stratified_inside_bounds_and_monotone():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 2.0, 6.0, n_rays=16, n_samples=64, perturb=True)
    z = np.asarray(z)
    assert z.shape == (16, 64)
    assert (z >= 2.0 - 1e-6).all() and (z <= 6.0 + 1e-6).all()
    assert (np.diff(z, axis=-1) >= 0).all()


def test_stratified_deterministic_eval():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 2.0, 6.0, n_rays=3, n_samples=5, perturb=False)
    want = np.linspace(2.0, 6.0, 5)
    np.testing.assert_allclose(np.asarray(z), np.tile(want, (3, 1)), atol=1e-6)


def test_stratified_lindisp():
    key = jax.random.PRNGKey(0)
    z = stratified_sample(key, 1.0, 4.0, n_rays=1, n_samples=3, perturb=False,
                          lindisp=True)
    # inverse-depth linspace: 1/z in linspace(1, 0.25, 3)
    want = 1.0 / np.linspace(1.0, 0.25, 3)
    np.testing.assert_allclose(np.asarray(z)[0], want, atol=1e-6)


def test_sample_pdf_deterministic_matches_oracle():
    rng = np.random.default_rng(2)
    R, B, N = 4, 8, 16
    bins = np.sort(rng.uniform(0, 10, size=(R, B + 1)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, B)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    got = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights),
                                N, det=True))
    u = np.tile(np.linspace(0, 1, N, dtype=np.float32), (R, 1))
    want = oracle_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_pdf_concentrates_mass():
    # all mass in one bin → all samples land in that bin
    R, B, N = 2, 10, 32
    bins = np.tile(np.linspace(0.0, 1.0, B + 1, dtype=np.float32), (R, 1))
    weights = np.zeros((R, B), np.float32)
    weights[:, 3] = 1.0
    key = jax.random.PRNGKey(1)
    s = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights),
                              N, det=False))
    lo, hi = bins[0, 3], bins[0, 4]
    # ~eps leakage into other bins is allowed; the bulk must be inside
    frac_inside = ((s >= lo - 1e-3) & (s <= hi + 1e-3)).mean()
    assert frac_inside > 0.95


def test_sample_pdf_inside_range():
    rng = np.random.default_rng(3)
    R, B, N = 3, 6, 20
    bins = np.sort(rng.uniform(-5, 5, size=(R, B + 1)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(R, B)).astype(np.float32)
    key = jax.random.PRNGKey(2)
    s = np.asarray(sample_pdf(key, jnp.asarray(bins), jnp.asarray(weights), N))
    assert (s >= bins[:, :1] - 1e-5).all() and (s <= bins[:, -1:] + 1e-5).all()
