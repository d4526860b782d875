"""Sinusoidal positional encoding γ (BASELINE.json:5).

γ(p) = [p, sin(2⁰p), cos(2⁰p), …, sin(2^{L-1}p), cos(2^{L-1}p)] applied
component-wise. L=10 for xyz → 63 dims; L=4 for view dirs → 27 dims.

Frequency layout matches the canonical NeRF formulation: bands 2^k (the
2^k·π variant differs only by a reparameterization of the learned weights).
Per-frequency ordering is [sin, cos] interleaved by frequency, features
innermost — i.e. output[..., :D] = x, then for each freq k:
sin(x·2^k) (D dims), cos(x·2^k) (D dims).
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(d: int, num_freqs: int, include_input: bool = True) -> int:
    """Output dimensionality of posenc for d-dim input."""
    return d * (2 * num_freqs + (1 if include_input else 0))


def posenc(x, num_freqs: int, include_input: bool = True):
    """Encode x (..., D) → (..., D*(2L [+1])).

    Shape-static, fuses to a handful of VPU ops under XLA; the Pallas fused
    posenc+MLP kernel re-derives this inline (kernels/posenc_mlp_pallas.py).
    """
    if num_freqs == 0:
        return x if include_input else x[..., :0]
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)          # (L,)
    xb = x[..., None, :] * freqs[:, None]                         # (..., L, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)    # (..., L, 2D)
    enc = enc.reshape(*x.shape[:-1], -1)                          # (..., 2LD)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
