import jax.numpy as jnp
import numpy as np

from fashion_nerf.core.posenc import posenc, posenc_dim
from oracle import oracle_posenc


def test_dims():
    x = jnp.zeros((5, 3))
    assert posenc(x, 10).shape == (5, 63)
    assert posenc(x, 4).shape == (5, 27)
    assert posenc(x, 10, include_input=False).shape == (5, 60)
    assert posenc_dim(3, 10) == 63
    assert posenc_dim(3, 4) == 27


def test_zero_input():
    x = jnp.zeros((2, 3))
    out = np.asarray(posenc(x, 4))
    # x part zero, sin parts zero, cos parts one
    assert np.allclose(out[:, :3], 0.0)
    enc = out[:, 3:].reshape(2, 4, 6)  # (N, L, [sin3, cos3])
    assert np.allclose(enc[:, :, :3], 0.0)
    assert np.allclose(enc[:, :, 3:], 1.0)


def test_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    got = np.asarray(posenc(jnp.asarray(x), 6))
    want = oracle_posenc(x, 6)
    # oracle concatenates [x, sin f0, cos f0, sin f1, ...] — same layout
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_no_freqs():
    x = jnp.ones((3, 2))
    assert posenc(x, 0).shape == (3, 2)
    assert posenc(x, 0, include_input=False).shape == (3, 0)
