#!/usr/bin/env python
"""Pose-5 (az60 el25 r2.6) close-pose gate-failure diagnostic (r5).

The 7-pose gate's adversarial close pose loses -0.33 dB vs dense and NO
sampling/margin/threshold/budget knob moves it (triage battery, r5 notes).
This script isolates the mechanism by stripping the production stack layer
by layer at that pose and mapping WHERE the error lives:

  rows: prod (shipped) / prod minus cull_acc / blockwise full budget w/ occ
        / blockwise full budget NO occ eps=0 / XLA culled full budget
  map:  per-row PSNR vs dense + error split by dense-acc bands
        (background <0.05 / silhouette 0.05-0.95 / interior >0.95)

Usage: PYTHONPATH=src python scripts/r5_pose5_diag.py [--pose 5]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    import argparse
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fashion_nerf.assets import load_flagship
    from fashion_nerf.config import load_config
    from fashion_nerf.core.occupancy import build_jit
    from fashion_nerf.metrics import psnr
    from fashion_nerf.models.proposal import attach_proposal
    from fashion_nerf.render.blockwise import render_image_blockwise
    from fashion_nerf.render.renderer import render_image
    from fashion_nerf.train.loop import make_fields

    ap = argparse.ArgumentParser()
    ap.add_argument("--pose", type=int, default=5)
    args = ap.parse_args()

    H = W = 800
    params, meta = load_flagship()
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))

    def look_at(eye):
        eye = np.asarray(eye, np.float32)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0], np.float32))
        right = right / np.linalg.norm(right)
        up = np.cross(right, fwd)
        m = np.eye(4, dtype=np.float32)[:3]
        m[:, 0], m[:, 1], m[:, 2], m[:, 3] = right, up, -fwd, eye
        return m

    def ring(az_deg, el_deg, r):
        az, el = math.radians(az_deg), math.radians(el_deg)
        return look_at([r * math.cos(el) * math.sin(az),
                        r * math.sin(el),
                        r * math.cos(el) * math.cos(az)])

    POSES = {
        0: np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 4.0]],
                    np.float32),
        2: ring(-45, 20, 3.2),
        5: ring(60, 25, 2.6),
        6: ring(10, 75, 4.0),
    }
    pose = jnp.asarray(POSES[args.pose])

    # dense reference (the gate's comparator)
    dense_cfg = load_config("blender_lego", [
        "occupancy.enabled=false", "proposal.enabled=false",
        "render.eval_n_coarse=0", "render.eval_n_fine=0"])
    dfc, dff = make_fields(dense_cfg)
    fcp = functools.partial(dfc, params["coarse"])
    ffp = functools.partial(dff, params["fine"])
    dense = jax.jit(lambda p: render_image(
        fcp, ffp, H, W, focal, p, dense_cfg))(pose)
    d_rgb = np.asarray(dense["rgb"])
    d_acc = np.asarray(dense["acc"])
    print("dense ready", flush=True)

    bands = {
        "background(acc<.05)": d_acc < 0.05,
        "silhouette(.05-.95)": (d_acc >= 0.05) & (d_acc <= 0.95),
        "interior(acc>.95)": d_acc > 0.95,
    }
    for k, m in bands.items():
        print(f"  band {k}: {m.mean():.3f} of pixels", flush=True)

    def report(name, img):
        img = np.asarray(img)
        p_all = float(psnr(jnp.asarray(img), jnp.asarray(d_rgb)))
        parts = []
        for k, m in bands.items():
            if m.sum() == 0:
                continue
            mse = float(np.mean((img[m] - d_rgb[m]) ** 2))
            # band's contribution to whole-image MSE
            contrib = mse * m.mean()
            parts.append(f"{k}: mse {mse:.3e} contrib {contrib:.3e}")
        print(f"{name:34s} vs dense {p_all:7.2f} dB | " + " | ".join(parts),
              flush=True)

    def run(name, extras, use_occ=True, use_prop=True):
        cfg = load_config("blender_lego", extras)
        _, ff = make_fields(cfg)
        occ = build_jit(cfg, ff, params["fine"]) if use_occ else None
        rp = attach_proposal(cfg, dict(params), occ=occ) if use_prop \
            else dict(params)
        img = jax.jit(lambda p: render_image_blockwise(
            rp, cfg, H, W, focal, p, occ=occ)["rgb"])(pose)
        float(img[0, 0, 0])
        report(name, img)

    run("prod (shipped)", [])
    run("prod, no cull_acc", ["proposal.cull_acc=0"])
    run("blockwise full budget + occ", [
        "proposal.enabled=false", "render.eval_n_coarse=0",
        "render.eval_n_fine=0"], use_prop=False)
    run("blockwise full, no occ, eps=0", [
        "proposal.enabled=false", "occupancy.enabled=false",
        "render.eval_n_coarse=0", "render.eval_n_fine=0",
        "kernels.early_term_eps=0"], use_occ=False, use_prop=False)

    # XLA culled path, full budget (renderer.render_image with occ)
    cfg = load_config("blender_lego", [
        "proposal.enabled=false", "render.eval_n_coarse=0",
        "render.eval_n_fine=0", "kernels.use_pallas=false"])
    fc2, ff2 = make_fields(cfg)
    occ = build_jit(cfg, ff2, params["fine"])
    fcb = functools.partial(fc2, params["coarse"])
    ffb = functools.partial(ff2, params["fine"])
    img = jax.jit(lambda p: render_image(
        fcb, ffb, H, W, focal, p, cfg, occ=occ)["rgb"])(pose)
    float(img[0, 0, 0])
    report("XLA culled full budget", img)


if __name__ == "__main__":
    main()
