"""Kill-and-resume recovery (SURVEY.md §5.3/5.4): inject a fault mid-run,
resume from the last checkpoint, and confirm the run completes with the step
count and a sane trajectory."""

import numpy as np
import pytest

from fashion_nerf.config import load_config
from fashion_nerf.train.loop import train

_OVR = ["model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
        "sampling.n_coarse=16", "sampling.n_fine=0", "train.batch_rays=256",
        "train.iters=30", "train.log_every=10", "train.eval_every=1000",
        "train.ckpt_every=10", "train.precrop_iters=0",
        "kernels.use_pallas=false", "model.compute_dtype=float32",
        "model.use_viewdirs=false"]


def test_fault_then_resume(tmp_path):
    cfg = load_config("tiny_lego", _OVR + [f"train.seed=7"])
    import dataclasses
    cfg = dataclasses.replace(cfg, out_dir=str(tmp_path))

    # crash at step 25 (after the step-20 checkpoint)
    with pytest.raises(RuntimeError, match="injected fault"):
        train(cfg, log_fn=lambda e: None, fault_at_step=25)

    # resume: restores step 20 and finishes the remaining 10 steps
    state, history = train(cfg, log_fn=lambda e: None, resume=True)
    assert int(state.step) == 30
    losses = [h["loss"] for h in history if "loss" in h]
    assert np.isfinite(losses).all()
    # only the post-resume window was run
    steps = [h["step"] for h in history if "loss" in h]
    assert min(steps) == 30  # log_every=10 → first log at step 30

def test_resume_without_checkpoint_starts_fresh(tmp_path):
    import dataclasses
    cfg = load_config("tiny_lego", _OVR)
    cfg = dataclasses.replace(cfg, out_dir=str(tmp_path))
    state, _ = train(cfg, log_fn=lambda e: None, resume=True)
    assert int(state.step) == 30
