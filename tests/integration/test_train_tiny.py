"""Integration: the BASELINE.json:7 CPU-runnable config exists precisely to
enable this (SURVEY.md §4.4): short training must reduce loss; checkpoint →
restore → identical continuation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fashion_nerf.config import load_config
from fashion_nerf import ckpt as ckpt_lib
from fashion_nerf.data.pipeline import RayDataset
from fashion_nerf.data.synthetic import make_synthetic_scene
from fashion_nerf.train.loop import make_train_step
from fashion_nerf.train.state import create_train_state

_OVR = ["model.net_depth=4", "model.net_width=64", "model.posenc_xyz=4",
        "train.batch_rays=256", "sampling.n_coarse=32"]


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_views=6, H=32, W=32, n_samples=64)


@pytest.fixture(scope="module")
def setup(scene):
    # NOTE: no shared TrainState here — the jitted step donates its input
    # buffers, so each test must create its own fresh state.
    cfg = load_config("tiny_lego", _OVR)
    ds = RayDataset(scene["images"], scene["poses"], scene["focal"])
    step_fn = make_train_step(cfg, ds)
    return cfg, ds, step_fn


def test_loss_decreases(setup):
    cfg, ds, step_fn = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    all_rays = ds.batch_arrays()
    losses = []
    for _ in range(60):
        state, m = step_fn(state, all_rays)
        losses.append(float(m["loss"]))
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.7 * first, (first, last)
    assert np.isfinite(losses).all()


def test_ckpt_roundtrip_determinism(setup, tmp_path):
    cfg, ds, step_fn = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    all_rays = ds.batch_arrays()
    for _ in range(3):
        state, _ = step_fn(state, all_rays)
    # NOTE: donate_argnums invalidates the input state; keep a host copy
    saved = jax.device_get(state)
    ckpt_lib.save(str(tmp_path / "ckpt"), saved, wait=True)

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == int(saved.step)

    s_a, m_a = step_fn(jax.device_put(saved), all_rays)
    s_b, m_b = step_fn(jax.device_put(restored), all_rays)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    leaves_a = jax.tree_util.tree_leaves(s_a.params)
    leaves_b = jax.tree_util.tree_leaves(s_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_occ_accelerated_training_smoke(scene, tmp_path):
    """r3 (VERDICT r2 #3): occupancy-accelerated training — grid refresh
    from the live field + reduced-budget culled steps interleaved with
    dense ones — trains end-to-end and reduces loss."""
    import dataclasses
    from fashion_nerf.train.loop import train

    cfg = load_config("tiny_lego", _OVR + [
        "train.iters=40", "train.log_every=5",
        "train.eval_every=1000", "train.ckpt_every=1000",
        "train.occ_train=true", "train.occ_warmup=10",
        "train.occ_refresh_every=10", "train.occ_dense_every=4",
        "train.occ_coarse=16", "train.sparsity_weight=1e-4",
        "occupancy.resolution=16",
    ])
    cfg = dataclasses.replace(cfg, out_dir=str(tmp_path))
    _, history = train(cfg, dataset_dict=dict(
        scene, H=32, W=32, near=2.0, far=6.0))
    losses = [h["loss"] for h in history if "loss" in h]
    assert len(losses) == 8 and np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_render_image_shape(setup, scene):
    import functools
    cfg, ds, step_fn = setup
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    from fashion_nerf.train.loop import make_fields
    from fashion_nerf.render.renderer import render_image
    field_c, _ = make_fields(cfg)
    fc = functools.partial(field_c, state.params["coarse"])
    out = render_image(fc, None, 32, 32, scene["focal"],
                       jnp.asarray(scene["val_pose"]), cfg)
    assert out["rgb"].shape == (32, 32, 3)
    assert out["depth"].shape == (32, 32)
    x = np.asarray(out["rgb"])
    assert np.isfinite(x).all() and (x >= 0).all() and (x <= 1.001).all()
