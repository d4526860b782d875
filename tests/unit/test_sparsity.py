"""Density sparsity prior (train/loop.py::_sparsity_loss): wiring and the
decay property that keeps the occupancy grid tight (core/occupancy.py)."""

import jax
import numpy as np

from fashion_nerf.config import load_config
from fashion_nerf.data.pipeline import RayDataset
from fashion_nerf.data.synthetic import make_synthetic_scene
from fashion_nerf.train.loop import make_train_step
from fashion_nerf.train.state import create_train_state


def _tiny_cfg(weight):
    return load_config("blender_lego", [
        "model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
        "model.posenc_dir=2", "sampling.n_coarse=8", "sampling.n_fine=8",
        "train.batch_rays=64", "train.precrop_iters=0",
        "train.sparsity_points=64",
        f"train.sparsity_weight={weight}",
    ])


def test_sparsity_metric_reported_and_finite():
    cfg = _tiny_cfg(1e-4)
    scene = make_synthetic_scene(n_views=2, H=8, W=8, n_samples=8)
    ds = RayDataset(scene["images"], scene["poses"], scene["focal"])
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, ds)
    state, m = step(state, ds.batch_arrays())
    assert "sparsity" in m
    assert np.isfinite(float(m["sparsity"]))
    assert np.isfinite(float(m["loss"]))


def test_zero_weight_has_no_sparsity_term():
    cfg = _tiny_cfg(0.0)
    scene = make_synthetic_scene(n_views=2, H=8, W=8, n_samples=8)
    ds = RayDataset(scene["images"], scene["poses"], scene["focal"])
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, ds)
    _, m = step(state, ds.batch_arrays())
    assert "sparsity" not in m


def test_sparsity_drives_unsupervised_density_down():
    """Pure sparsity training (no rays needed): mean density at random world
    points must decrease — the floaters-decay property."""
    import jax.numpy as jnp
    import optax
    from fashion_nerf.train.loop import _sparsity_loss, make_fields

    cfg = _tiny_cfg(1.0)
    field_c, field_f = make_fields(cfg, training=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    params = state.params
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss(p, key):
        return _sparsity_loss(cfg, p, field_c, field_f, key, None)

    key = jax.random.PRNGKey(1)
    l0 = float(loss(params, key))

    @jax.jit
    def step(p, o, k):
        g = jax.grad(loss)(p, k)
        u, o = tx.update(g, o, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u), o

    for i in range(20):
        params, opt = step(params, opt, jax.random.fold_in(key, i))
    l1 = float(loss(params, jax.random.fold_in(key, 999)))
    assert l1 < l0, (l0, l1)
