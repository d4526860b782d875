"""Integration: the LLFF/NDC acceptance path (BASELINE.json:9) — train on a
hermetic forward-facing scene with NDC ray parameterization."""

import numpy as np

from fashion_nerf.config import load_config
from fashion_nerf.data.synthetic import make_forward_scene
from fashion_nerf.train.loop import train

_OVR = ["model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
        "model.posenc_dir=2", "sampling.n_coarse=16", "sampling.n_fine=16",
        "train.batch_rays=256", "train.iters=40", "train.log_every=10",
        "train.eval_every=40", "train.ckpt_every=1000",
        "train.precrop_iters=0", "kernels.use_pallas=false",
        "model.compute_dtype=float32", "sampling.raw_noise_std=0.0"]


def test_ndc_training_runs_and_improves():
    cfg = load_config("llff_fern", _OVR)
    assert cfg.render.ndc and cfg.render.near == 0.0
    scene = make_forward_scene(n_views=4, H=16, W=24, n_samples=48)
    state, history = train(cfg, dataset_dict=scene, log_fn=lambda e: None)
    losses = [h["loss"] for h in history if "loss" in h]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    val = [h["val_psnr"] for h in history if "val_psnr" in h]
    assert val and np.isfinite(val[0]) and val[0] > 5.0
