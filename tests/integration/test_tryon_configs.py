"""Integration: the two try-on acceptance configs (BASELINE.json:10-11)
train end-to-end on the hermetic synthetic scene — garment-conditioned and
per-frame latent-code NeRF."""

import jax
import numpy as np
import pytest

from fashion_nerf.config import load_config
from fashion_nerf.train.loop import train

_SMALL = ["model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
          "model.posenc_dir=2", "sampling.n_coarse=16", "sampling.n_fine=16",
          "train.batch_rays=256", "train.iters=40", "train.log_every=10",
          "train.eval_every=40", "train.ckpt_every=1000",
          "train.precrop_iters=0", "kernels.use_pallas=false",
          "model.compute_dtype=float32"]


def _losses(history):
    return [h["loss"] for h in history if "loss" in h]


def test_viton_tryon_trains():
    cfg = load_config("viton_tryon", _SMALL)
    logs = []
    state, history = train(cfg, log_fn=logs.append)
    losses = _losses(history)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    # encoder params got gradients: they moved
    assert "encoder" in state.params
    val = [h["val_psnr"] for h in history if "val_psnr" in h]
    assert val and np.isfinite(val[0])


def test_dynamic_tryon_trains():
    cfg = load_config("dynamic_tryon", _SMALL + ["model.n_latents=12",
                                                 "model.latent_dim=8"])
    state, history = train(cfg, log_fn=lambda e: None)
    losses = _losses(history)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    assert "latents" in state.params
    table = np.asarray(
        state.params["latents"]["params"]["codes"]["embedding"])
    assert table.shape == (12, 8)
    # latents trained: different frames drift apart
    assert not np.allclose(table[0], table[1])
