#!/usr/bin/env python
"""Training batch-scaling measurement (VERDICT r4 missing #4 / next #5).

The r4 note claimed train steps are dispatch-bound (~8 ms floor at batch
1024), but the shipped flagship batch is 4096 and its logged 127k rays/s
implies ~32 ms/step — the floor story and the shipped config were never
reconciled. This measures it: sustained rays/s (median of post-compile
log windows — the first window carries the ~30 s fused-backward compile),
ms/step, and end-PSNR at an EQUAL-RAY budget across batch
1024/4096/8192/16384, occ_train off and on. The fused Pallas backward is
the only path that compiles at 16k (XLA OOMs the scratch — BASELINE.md r1).

lr is NOT retuned per batch (preset schedule throughout): the PSNR column
is an equal-optimizer-work comparison, not a tuned-quality frontier.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r5_train_scaling.py \
        [--total-rays 4194304] [--occ both|off|on]
"""

import argparse
import dataclasses
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def run(batch: int, total_rays: int, occ_on: bool):
    from fashion_nerf.config import load_config
    from fashion_nerf.train.loop import train

    steps = max(total_rays // batch, 64)
    log_every = max(steps // 8, 8)
    ovr = [
        f"train.batch_rays={batch}", f"train.iters={steps}",
        f"train.log_every={log_every}", f"train.eval_every={steps}",
        "train.ckpt_every=1000000", "train.sparsity_weight=3e-4",
        f"train.lr_decay_steps={steps}",
    ]
    if occ_on:
        # warmup/refresh scale with the (equal-ray) step budget so the
        # reduced-budget phase actually runs at every batch size
        ovr += ["train.occ_train=true",
                f"train.occ_warmup={max(steps // 8, 16)}",
                f"train.occ_refresh_every={max(steps // 8, 16)}"]
    cfg = load_config("blender_lego", ovr)
    with tempfile.TemporaryDirectory() as td:
        cfg = dataclasses.replace(cfg, out_dir=td)
        _, history = train(cfg)
    windows = [h["rays_per_sec"] for h in history if "rays_per_sec" in h]
    val = [h["val_psnr"] for h in history if "val_psnr" in h]
    # drop window 0: it absorbs the jit compile (and the occ-refresh compile
    # in the occ_on arm); median of the rest is the sustained number
    sustained = statistics.median(windows[1:]) if len(windows) > 1 else (
        windows[0] if windows else 0.0)
    return {
        "batch": batch, "steps": steps, "occ_train": occ_on,
        "sustained_rays_per_sec": round(sustained, 1),
        "ms_per_step": round(batch / sustained * 1e3, 2) if sustained else None,
        "val_psnr": round(val[-1], 2) if val else None,
        "windows": [round(w, 1) for w in windows],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total-rays", type=int, default=4_194_304)
    ap.add_argument("--occ", default="both", choices=("both", "off", "on"))
    ap.add_argument("--batches", default="1024,4096,8192,16384")
    args = ap.parse_args()

    occ_arms = {"both": (False, True), "off": (False,), "on": (True,)}[args.occ]
    for batch in (int(b) for b in args.batches.split(",")):
        for occ_on in occ_arms:
            print(json.dumps(run(batch, args.total_rays, occ_on)), flush=True)


if __name__ == "__main__":
    main()
