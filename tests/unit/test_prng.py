import jax
import numpy as np
import pytest

from fashion_nerf.prng import KeyChain, KeyReuseError


def test_fresh_keys_differ():
    c = KeyChain(jax.random.PRNGKey(0))
    k1, k2 = c.next("a"), c.next("b")
    assert not np.array_equal(np.asarray(jax.random.key_data(k1)),
                              np.asarray(jax.random.key_data(k2)))


def test_label_reuse_raises():
    c = KeyChain(jax.random.PRNGKey(0))
    c.once("stratified")
    with pytest.raises(KeyReuseError):
        c.once("stratified")


def test_frozen_raises():
    c = KeyChain(jax.random.PRNGKey(0))
    c.freeze()
    with pytest.raises(KeyReuseError):
        c.next()


def test_fork_independent():
    c = KeyChain(jax.random.PRNGKey(0))
    f = c.fork()
    a = np.asarray(jax.random.uniform(c.next(), (4,)))
    b = np.asarray(jax.random.uniform(f.next(), (4,)))
    assert not np.allclose(a, b)
