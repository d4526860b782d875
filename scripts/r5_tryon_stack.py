#!/usr/bin/env python
"""Extend the r4 perf stack to the try-on presets — measurement first
(VERDICT r4 missing #3 / weak #5).

viton_tryon: trains a short conditioned ckpt (sparsity prior on, so the
occupancy grid is sound), builds cond-aware occupancy (occupancy.build_jit
cond, r5), attaches a conditioned-teacher proposal, and scores the
production blockwise stack against the dense XLA render at 800×800:
  rows: blockwise full budget + occ / + proposal p64+f96 + cull_acc
  per row: PSNR delta vs dense + rays/s (dense rays/s as the baseline).

dynamic_tryon: same, plus the latent question the r4 verdict docked
(cli.py renders videos with the full coarse pass because the proposal
teacher is latent-specific): distill ONE proposal at latent 0 and measure
the per-frame delta for latents 0..3 — the decision becomes a number.

    PYTHONPATH=src python scripts/r5_tryon_stack.py [--preset viton|dynamic]
    [--iters N] [--run-dir DIR]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def _train_or_restore(cfg, run_dir):
    """Train cfg into run_dir (resume-aware: skips if the ckpt exists)."""
    import jax
    from fashion_nerf import ckpt as ckpt_lib
    from fashion_nerf.train.loop import train
    from fashion_nerf.train.state import create_train_state

    cfg = dataclasses.replace(cfg, out_dir=run_dir)
    ckpt_dir = os.path.join(run_dir, cfg.name, "ckpt")
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        tmpl = create_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
        state = ckpt_lib.restore(ckpt_dir, tmpl)
        if int(state.step) >= cfg.train.iters:
            print(f"(restored {cfg.name} @ step {int(state.step)})",
                  flush=True)
            return cfg, state
    t0 = time.perf_counter()
    state, _ = train(cfg)
    print(f"(trained {cfg.name} {cfg.train.iters} steps in "
          f"{time.perf_counter() - t0:.0f}s)", flush=True)
    return cfg, state


def measure(name, cfg, state, H=800, W=800, frame_ids=(0,)):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fashion_nerf.core.occupancy import build_jit
    from fashion_nerf.metrics import psnr
    from fashion_nerf.models.proposal import attach_proposal
    from fashion_nerf.render.blockwise import render_image_blockwise
    from fashion_nerf.render.renderer import render_image
    from fashion_nerf.train.loop import (_eval_cond, _load_dataset,
                                         make_fields, resolve_garment)

    d = _load_dataset(cfg)
    focal = float(d["focal"]) * H / d["H"]   # scale intrinsics to 800^2
    pose = jnp.asarray(np.asarray(d["val_pose"]))
    garment = resolve_garment(cfg, d, d["H"], d["W"])

    dense_cfg = dataclasses.replace(
        cfg,
        occupancy=dataclasses.replace(cfg.occupancy, enabled=False),
        proposal=dataclasses.replace(cfg.proposal, enabled=False),
        kernels=dataclasses.replace(cfg.kernels, use_pallas=False),
        render=dataclasses.replace(cfg.render, eval_n_coarse=0,
                                   eval_n_fine=0))
    field_c, field_f = make_fields(dense_cfg)
    fcp = functools.partial(field_c, state.params["coarse"])
    ffp = functools.partial(field_f, state.params["fine"])

    conds = [_eval_cond(cfg, state.params, garment, frame_id=i)
             for i in frame_ids]

    dense_fn = jax.jit(lambda p, c: render_image(
        fcp, ffp, H, W, focal, p, dense_cfg, cond=c)["rgb"])
    denses = []
    t_dense = None
    for c in conds:
        img = dense_fn(pose, c)
        float(img[0, 0, 0])
        t0 = time.perf_counter()
        img = dense_fn(pose, c)
        float(img[0, 0, 0])
        t_dense = time.perf_counter() - t0
        denses.append(np.asarray(img))
    print(f"{name}: dense XLA {H * W / t_dense / 1e6:.3f} Mrays/s",
          flush=True)

    def prod_row(label, extras, with_prop):
        rcfg = cfg
        for path, val in extras.items():
            sect, key = path.split(".")
            rcfg = dataclasses.replace(
                rcfg, **{sect: dataclasses.replace(
                    getattr(rcfg, sect), **{key: val})})
        _, ff2 = make_fields(rcfg)
        occ = build_jit(rcfg, ff2, state.params["fine"], cond=conds[0]) \
            if rcfg.occupancy.enabled else None
        params = dict(state.params)
        if with_prop:
            params = attach_proposal(rcfg, params, occ=occ, cond=conds[0],
                                     use_asset=False)
            assert "proposal" in params, "proposal failed to attach"
        fn = jax.jit(lambda p, c: render_image_blockwise(
            params, rcfg, H, W, focal, p, occ=occ, cond=c)["rgb"])
        for i, c in zip(frame_ids, conds):
            img = fn(pose, c)
            float(img[0, 0, 0])
            t0 = time.perf_counter()
            img = fn(pose, c)
            float(img[0, 0, 0])
            dt = time.perf_counter() - t0
            delta = float(psnr(jnp.asarray(np.asarray(img)),
                               jnp.asarray(denses[frame_ids.index(i)])))
            print(json.dumps({
                "row": label, "frame": i,
                "psnr_vs_dense": round(delta, 2),
                "Mrays_s": round(H * W / dt / 1e6, 3),
                "speedup_vs_dense": round(t_dense / dt, 2),
            }), flush=True)

    # fused_carry in every prod row: the carry march is the r4+ default
    # march (and the two-stage pipeline's per-block glue chain costs ~250 s
    # of compile at full budget — BASELINE.md r3)
    prod_row("blockwise+occ full budget",
             {"occupancy.enabled": True, "kernels.fused_carry": True,
              "kernels.early_term_eps": 1e-3}, with_prop=False)
    prod_row("blockwise+occ+proposal p64+f96+cull",
             {"occupancy.enabled": True, "kernels.fused_carry": True,
              "kernels.early_term_eps": 1e-3,
              "proposal.enabled": True,
              "proposal.cull_acc": 5e-4, "proposal.block_samples": 64,
              "render.eval_n_coarse": 32, "render.eval_n_fine": 96},
             with_prop=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="viton",
                    choices=("viton", "dynamic", "both"))
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--run-dir", default="/tmp/r5_tryon")
    args = ap.parse_args()

    from fashion_nerf.config import load_config

    if args.preset in ("viton", "both"):
        cfg = load_config("viton_tryon", [
            f"train.iters={args.iters}",
            f"train.eval_every={args.iters}",
            f"train.lr_decay_steps={args.iters}",
            # sparsity prior: occupancy culling is only sound when
            # out-of-box density is trained toward zero (OccupancyConfig
            # docstring / ADVICE r2)
            "train.sparsity_weight=1e-4",
        ])
        cfg, state = _train_or_restore(cfg, os.path.join(args.run_dir, "v"))
        measure("viton_tryon", cfg, state)

    if args.preset in ("dynamic", "both"):
        cfg = load_config("dynamic_tryon", [
            f"train.iters={args.iters}",
            f"train.eval_every={args.iters}",
            f"train.lr_decay_steps={args.iters}",
            "train.sparsity_weight=1e-4",
        ])
        cfg, state = _train_or_restore(cfg, os.path.join(args.run_dir, "d"))
        # the latent question (VERDICT r4 weak #5): ONE latent-0 proposal +
        # latent-0 occupancy, scored across frames 0..3
        measure("dynamic_tryon", cfg, state, frame_ids=(0, 1, 2, 3))


if __name__ == "__main__":
    main()
