"""L8 — image quality metrics (BASELINE.json:2).

PSNR = −10·log₁₀(MSE). SSIM follows the standard Wang et al. definition:
11×11 Gaussian window σ=1.5, K1=0.01, K2=0.03, per-channel then averaged
(SURVEY.md §7 hard-part 5: pinned to this convention since the reference
publishes no implementation to match — /root/reference/README.md:1-2).
The rays/sec throughput meter lives where it is measured: train/loop.py's
log cadence and bench/throughput.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def psnr(pred, target, max_val: float = 1.0):
    m = mse(pred, target)
    return -10.0 * jnp.log10(m / (max_val ** 2) + 1e-12)


def mse_to_psnr(m, max_val: float = 1.0):
    return -10.0 * jnp.log10(m / (max_val ** 2) + 1e-12)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)                                  # (size, size)


def ssim(pred, target, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Mean SSIM over an (H, W, C) image pair, VALID padding (standard)."""
    kern = _gaussian_kernel(filter_size, filter_sigma)
    kern = kern[:, :, None, None]                           # (kh, kw, 1, 1)

    def filt(img):
        # (H, W, C) → depthwise valid conv via feature-group trick.
        # HIGHEST precision: on TPU the default bf16 conv loses ~1e-3, and
        # the σ² = E[x²]−μ² cancellation amplifies that into SSIM > 1 on
        # near-identical images (observed 1.016 on a 33 dB render).
        x = img[None].transpose(0, 3, 1, 2)                 # (1, C, H, W)
        C = x.shape[1]
        k = jnp.tile(kern.transpose(3, 2, 0, 1), (C, 1, 1, 1))  # (C,1,kh,kw)
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)
        return y[0].transpose(1, 2, 0)                      # (H', W', C)

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    # variances are non-negative by definition; float cancellation isn't
    sigma_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(filt(target * target) - mu_tt, 0.0)
    sigma_pt = filt(pred * target) - mu_pt

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(num / den)
