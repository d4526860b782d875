"""Metric tests — SSIM pinned to the standard Gaussian-11×11 definition
(SURVEY.md §7 hard-part 5: validated against known values, since there is no
reference implementation to match)."""

import jax.numpy as jnp
import numpy as np

from fashion_nerf.metrics import mse_to_psnr, psnr, ssim


def test_psnr_known_values():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    # MSE = 0.01 → PSNR = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)
    np.testing.assert_allclose(float(mse_to_psnr(jnp.asarray(0.01))),
                               20.0, atol=1e-3)


def test_psnr_identical():
    a = jnp.ones((4, 4, 3)) * 0.5
    assert float(psnr(a, a)) > 100.0


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)


def test_ssim_noise_decreases():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0.3, 0.7, size=(32, 32, 3))
                      .astype(np.float32))
    light = img + jnp.asarray(rng.normal(0, 0.02, img.shape)
                              .astype(np.float32))
    heavy = img + jnp.asarray(rng.normal(0, 0.2, img.shape)
                              .astype(np.float32))
    s_light = float(ssim(img, jnp.clip(light, 0, 1)))
    s_heavy = float(ssim(img, jnp.clip(heavy, 0, 1)))
    assert 1.0 > s_light > s_heavy


def test_ssim_constant_shift():
    # uniform luminance shift: SSIM = (2μ1μ2+C1)/(μ1²+μ2²+C1) exactly
    # (σ terms vanish for constant images)
    a = jnp.full((16, 16, 1), 0.4)
    b = jnp.full((16, 16, 1), 0.6)
    c1 = 0.01 ** 2
    want = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    np.testing.assert_allclose(float(ssim(a, b)), want, atol=1e-4)


def test_ssim_matches_scipy_reference_impl():
    """Cross-check against an independent NumPy implementation of the same
    Wang et al. definition (valid-padded Gaussian window)."""
    from scipy.ndimage import convolve

    def np_ssim(p, t, max_val=1.0):
        size, sigma = 11, 1.5
        x = np.arange(size) - 5.0
        g = np.exp(-0.5 * (x / sigma) ** 2)
        g /= g.sum()
        k = np.outer(g, g)

        def filt(img):
            out = np.stack([convolve(img[..., c], k, mode="constant")
                            for c in range(img.shape[-1])], -1)
            return out[5:-5, 5:-5]

        mu_p, mu_t = filt(p), filt(t)
        s_pp = filt(p * p) - mu_p ** 2
        s_tt = filt(t * t) - mu_t ** 2
        s_pt = filt(p * t) - mu_p * mu_t
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        num = (2 * mu_p * mu_t + c1) * (2 * s_pt + c2)
        den = (mu_p ** 2 + mu_t ** 2 + c1) * (s_pp + s_tt + c2)
        return (num / den).mean()

    rng = np.random.default_rng(2)
    a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    want = float(np_ssim(a, b))
    np.testing.assert_allclose(got, want, atol=2e-3)
