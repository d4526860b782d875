#!/usr/bin/env python
"""r3 occupancy-accelerated training gate (VERDICT r2 #3): hermetic
flagship train, occ_train off vs on, equal step count — reports sustained
rays/s and val PSNR. Done-criterion: >=1.5x rays/s at equal PSNR@3k.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r3_train_bench.py \
        [--steps 3000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def run(steps: int, occ_on: bool):
    import dataclasses

    from fashion_nerf.config import load_config
    from fashion_nerf.train.loop import train

    ovr = [
        f"train.iters={steps}", "train.log_every=500",
        f"train.eval_every={steps}", "train.ckpt_every=1000000",
        "train.sparsity_weight=3e-4", f"train.lr_decay_steps={steps}",
    ]
    if occ_on:
        ovr += ["train.occ_train=true", "train.occ_warmup=500",
                "train.occ_refresh_every=500"]
    cfg = load_config("blender_lego", ovr)
    with tempfile.TemporaryDirectory() as td:
        cfg = dataclasses.replace(cfg, out_dir=td)
        t0 = time.perf_counter()
        _, history = train(cfg)
        dt = time.perf_counter() - t0
    val = [h["val_psnr"] for h in history if "val_psnr" in h]
    rays = steps * cfg.train.batch_rays / dt
    return {"occ_train": occ_on, "steps": steps,
            "rays_per_sec": round(rays, 1),
            "wall_s": round(dt, 1),
            "val_psnr": round(val[-1], 2) if val else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    args = ap.parse_args()
    base = run(args.steps, occ_on=False)
    print(json.dumps(base), flush=True)
    fast = run(args.steps, occ_on=True)
    print(json.dumps(fast), flush=True)
    print(json.dumps({
        "speedup": round(fast["rays_per_sec"] / base["rays_per_sec"], 3),
        "psnr_delta": (round(fast["val_psnr"] - base["val_psnr"], 2)
                       if base["val_psnr"] and fast["val_psnr"] else None),
    }), flush=True)


if __name__ == "__main__":
    main()
