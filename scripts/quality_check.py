#!/usr/bin/env python
"""Equivalence evidence for the occupancy-culled fast render path
(VERDICT r1 #2 gate: PSNR delta < 0.1 dB vs the dense path on a TRAINED
model). Renders 800×800 with the committed flagship weights:

  dense   = 64+128 samples over [near, far]        (the r1 baseline path)
  culled  = same budget inside per-ray AABB ranges (sanity: ≈ dense)
  fast    = 32+64 budget inside per-ray AABB ranges (the production path)

and reports pairwise PSNR plus PSNR vs the analytic ground truth.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/quality_check.py
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
    from fashion_nerf.render.renderer import render_image
    from fashion_nerf.train.loop import make_fields

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated substring filter on row names")
    ap.add_argument("--gt-cache", default="/tmp/qc_gt.npz",
                    help="cache file prefix for the analytic GT render")
    ap.add_argument("--gate", action="store_true",
                    help="multi-pose gate (VERDICT r3 #7): dense 64+128 vs "
                    "the production preset over 5 poses; worst-pose delta "
                    "must clear -0.1 dB")
    ap.add_argument("--extra", default="",
                    help="comma-separated dotted overrides applied to the "
                    "production config in --gate mode")
    ap.add_argument("--pose", type=int, default=0,
                    help="POSES index the spec sweep renders (default: the "
                    "historical bench pose)")
    ap.add_argument("--poses", default="",
                    help="comma-separated POSES indices for --gate mode "
                    "(default: all — a shippable PASS needs all; subsets "
                    "are for fast candidate triage)")
    args = ap.parse_args()

    H = W = 800
    params, meta = load_flagship()
    print({k: (v.item() if getattr(v, 'ndim', 1) == 0 else str(v))
           for k, v in meta.items()}, flush=True)

    # python float, NOT np.float64: an f64 scalar here promotes every GT
    # array to f64 and NumPy's f64 sin/exp drop to scalar libm — measured
    # 100x slower on the textured scene (r3)
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))

    def look_at(eye):
        """OpenGL/NeRF c2w (camera -z = view dir, y up) looking at origin."""
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

    # pose 0 = the historical bench/train-like framing; the rest probe
    # off-axis / near / far / low-elevation views where per-ray occupied
    # intervals lengthen (VERDICT r3 weak #5: thresholds must not overfit
    # the single bench pose)
    POSES = [
        ("bench z=4", np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                                [0, 0, 1, 4.0]], np.float32)),
        ("az30 el10 r4", ring(30, 10, 4.0)),
        ("az-45 el20 r3.2 (near)", ring(-45, 20, 3.2)),
        ("az120 el35 r5 (far)", ring(120, 35, 5.0)),
        ("az200 el-15 r4.5", ring(200, -15, 4.5)),
        # r5 adversarial poses (VERDICT r4 weak #3): the first five are all
        # ring-at-origin r3.2–5.0; the r4 thresholds were tuned against
        # exactly those. Probe closer than any tuning pose and near
        # top-down, where per-ray occupied chords are longest.
        ("az60 el25 r2.6 (closer)", ring(60, 25, 2.6)),
        ("az10 el75 r4 (top-down)", ring(10, 75, 4.0)),
    ]
    c2w = None   # set to POSES[args.pose] once GT infra is defined below
    # analytic GT in row strips — a whole-image 800×800×512-sample pts array
    # is ~4 GB and thrashes the host
    from fashion_nerf.data.synthetic import field_np
    scene_scale = float(meta.get("scene_scale", 1.0))
    scene_sharp = float(meta.get("scene_sharp", 25.0))
    scene_texture = float(meta.get("scene_texture", 0.0))

    def gt_render(pose, n_samples=512, near=2.0, far=6.0, strip=50):
        """Analytic GT under one jit on the device (field_jnp docstring:
        the single-core host makes the NumPy sweep ~30 min; this is
        seconds). Strips via lax.map bound memory."""
        from fashion_nerf.data.synthetic import field_jnp

        c2w_j = jnp.asarray(pose)

        def strip_fn(y0):
            i = jnp.arange(W, dtype=jnp.float32)[None, :]
            j = (y0 + jnp.arange(strip, dtype=jnp.float32))[:, None]
            dirs = jnp.stack(
                [jnp.broadcast_to((i - W * .5) / focal, (strip, W)),
                 jnp.broadcast_to(-(j - H * .5) / focal, (strip, W)),
                 -jnp.ones((strip, W), jnp.float32)], -1)
            rays_d = dirs @ c2w_j[:3, :3].T
            rays_o = jnp.broadcast_to(c2w_j[:3, -1], rays_d.shape)
            t = jnp.linspace(near, far, n_samples, dtype=jnp.float32)
            pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
            rgb, sigma = field_jnp(pts, scale=scene_scale,
                                   sharp=scene_sharp,
                                   texture=scene_texture)
            delta = (far - near) / (n_samples - 1) * jnp.linalg.norm(
                rays_d, axis=-1, keepdims=True)
            alpha = 1.0 - jnp.exp(-sigma * delta)
            trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
            trans = jnp.concatenate(
                [jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
            w = alpha * trans
            img = (w[..., None] * rgb).sum(-2) \
                + (1.0 - w.sum(-1)[..., None])
            return jnp.clip(img, 0, 1)

        y0s = jnp.arange(0, H, strip, dtype=jnp.float32)
        img = jax.jit(lambda: jax.lax.map(strip_fn, y0s))()
        float(img[0, 0, 0, 0])   # sync through the tunnel
        return np.asarray(img).reshape(H, W, 3)

    def gt_for(pose_idx):
        """Analytic GT for POSES[pose_idx], cached per (scene, pose)."""
        pose = POSES[pose_idx][1]
        # pose 0 keeps the historical cache file/key; others get suffixed
        # files keyed on the pose bytes
        path = (args.gt_cache if pose_idx == 0 and args.gt_cache
                else (args.gt_cache + f".pose{pose_idx}.npz"
                      if args.gt_cache else ""))
        cache_key = f"{scene_scale}_{scene_sharp}_{scene_texture}"
        if pose_idx > 0:
            cache_key += "_" + pose.tobytes().hex()[:32]
        if path and os.path.exists(path):
            with np.load(path, allow_pickle=False) as z:
                if "key" in z.files and str(z["key"]) == cache_key:
                    print(f"(GT pose{pose_idx} from cache)", flush=True)
                    return z["gt"]
        img = gt_render(pose)
        if path:
            np.savez_compressed(path, gt=img, key=cache_key)
        return img

    c2w = POSES[args.pose][1]
    gt = gt_for(args.pose)
    print(f"GT ready (pose {args.pose}: {POSES[args.pose][0]})", flush=True)

    _prop_cache = {}

    def render(n_coarse, n_fine, occ_on, blockwise=False, extra=(),
               proposal=False, pose=None):
        cfg = load_config("blender_lego", [
            f"sampling.n_coarse={n_coarse}", f"sampling.n_fine={n_fine}",
            # the sweep's budget must actually apply: zero out the preset's
            # render-time eval budget override (config.py blender_lego)
            f"render.eval_n_coarse={n_coarse}",
            f"render.eval_n_fine={n_fine}",
            "occupancy.enabled=true"] + (
            ["kernels.use_pallas=true"] if blockwise else []) + list(extra))
        field_c, field_f = make_fields(cfg)
        fc = functools.partial(field_c, params["coarse"])
        ff = functools.partial(field_f, params["fine"])
        occ = (build_jit(cfg, field_f, params["fine"])
               if occ_on else None)
        rparams = params
        if proposal:
            # σ-only proposal coarse pass (r4): one distillation per
            # distill-relevant config, shared across render-budget rows
            from fashion_nerf.models.proposal import attach_proposal
            pc = cfg.proposal
            pkey = (pc.net_depth, pc.net_width, pc.posenc_xyz,
                    pc.distill_steps, pc.distill_batch, pc.distill_lr)
            if pkey not in _prop_cache:
                # use_asset=False: distill-budget sweep rows must actually
                # distill, not load the committed default asset
                _prop_cache[pkey] = attach_proposal(
                    cfg, dict(params), occ=occ,
                    use_asset=False)["proposal"]
            rparams = {**params, "proposal": _prop_cache[pkey]}
        pose_j = jnp.asarray(c2w if pose is None else pose)
        if blockwise:
            from fashion_nerf.render.blockwise import render_image_blockwise
            img = jax.jit(lambda p: render_image_blockwise(
                rparams, cfg, H, W, focal, p, occ=occ)["rgb"])(pose_j)
        else:
            img = jax.jit(lambda p: render_image(
                fc, ff, H, W, focal, p, cfg, occ=occ)["rgb"])(pose_j)
        float(img[0, 0, 0])   # sync through the tunnel
        return np.asarray(img)

    if args.gate:
        # multi-pose production gate (VERDICT r3 #7): the SHIPPED preset
        # (committed proposal asset, occupancy culling, eval budget) vs the
        # dense 64+128 XLA reference, per pose; throughput claims gate on
        # the WORST pose so bench-pose-only tuning gets caught here.
        import sys as _sys

        from fashion_nerf.core.occupancy import build_jit as _build_jit
        from fashion_nerf.models.proposal import attach_proposal
        from fashion_nerf.render.blockwise import render_image_blockwise

        extra = [s.strip() for s in args.extra.split(",") if s.strip()]
        prod_cfg = load_config("blender_lego", extra)
        _, prod_ff = make_fields(prod_cfg)
        occ = _build_jit(prod_cfg, prod_ff, params["fine"])
        rparams = attach_proposal(prod_cfg, dict(params), occ=occ)
        prod = jax.jit(lambda p: render_image_blockwise(
            rparams, prod_cfg, H, W, focal, p, occ=occ)["rgb"])

        dense_cfg = load_config("blender_lego", [
            "occupancy.enabled=false", "proposal.enabled=false",
            "render.eval_n_coarse=0", "render.eval_n_fine=0"])
        dfc, dff = make_fields(dense_cfg)
        fcp = functools.partial(dfc, params["coarse"])
        ffp = functools.partial(dff, params["fine"])
        dense_fn = jax.jit(lambda p: render_image(
            fcp, ffp, H, W, focal, p, dense_cfg)["rgb"])

        import time as _time

        worst = float("inf")
        worst_rps = float("inf")
        print(f"\n{'pose':26s} {'dense vs GT':>12s} {'prod vs GT':>12s} "
              f"{'delta':>8s} {'Mrays/s':>8s}", flush=True)
        pose_sel = ([int(s) for s in args.poses.split(",") if s.strip()]
                    or range(len(POSES)))
        for i in pose_sel:
            pname, pose = POSES[i]
            g = jnp.asarray(gt_for(i))
            pj = jnp.asarray(pose)
            di = dense_fn(pj)
            float(di[0, 0, 0])
            pi = prod(pj)
            float(pi[0, 0, 0])
            # per-pose throughput (VERDICT r4 weak #1): per-chunk cost
            # varies ~3× with silhouette fraction, so the headline must
            # show its spread across framings, not just the interior-heavy
            # bench pose. Steady state: the compile + occupancy/proposal
            # setup already ran in the quality render above.
            t0 = _time.perf_counter()
            pi2 = prod(pj)
            float(pi2[0, 0, 0])
            rps = H * W / (_time.perf_counter() - t0)
            worst_rps = min(worst_rps, rps)
            d_gt = float(psnr(jnp.asarray(di), g))
            p_gt = float(psnr(jnp.asarray(pi), g))
            delta = p_gt - d_gt
            worst = min(worst, delta)
            print(f"{pname:26s} {d_gt:12.2f} {p_gt:12.2f} {delta:+8.3f} "
                  f"{rps / 1e6:8.3f}", flush=True)
        ok = worst > -0.1
        print(f"\nworst-pose delta {worst:+.3f} dB — "
              f"{'PASS' if ok else 'FAIL'} (gate -0.1); "
              f"worst-pose throughput {worst_rps / 1e6:.3f} Mrays/s",
              flush=True)
        _sys.exit(0 if ok else 1)

    specs = [
        ("dense 64+128", dict(n_coarse=64, n_fine=128, occ_on=False)),
        ("culled 64+128", dict(n_coarse=64, n_fine=128, occ_on=True)),
        ("fast (culled 32+64)", dict(n_coarse=32, n_fine=64, occ_on=True)),
        ("blockwise 64+128 eps1e-4",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True)),
        ("blockwise 32+64",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True)),
        ("blockwise carry 64+128",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",))),
        ("blockwise carry 32+64",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",))),
        ("blockwise 64+128 macro=1",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("occupancy.macro=1",))),
        ("blockwise 16+32",
         dict(n_coarse=16, n_fine=32, occ_on=True, blockwise=True)),
        ("blockwise carry 16+32",
         dict(n_coarse=16, n_fine=32, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",))),
        ("blockwise carry 32+32",
         dict(n_coarse=32, n_fine=32, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",))),
        ("blockwise carry 24+48",
         dict(n_coarse=24, n_fine=48, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",))),
        ("blockwise carry 32+64 macro=8",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8"))),
        ("blockwise carry 32+64 macro=16 res=128",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=16",
                     "occupancy.resolution=128"))),
        ("blockwise carry 32+64 eps=1e-3",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3"))),
        # near-pose (POSES[2]) box-coverage sensitivity (r4 gate FAIL
        # diagnosis: FULL-budget blockwise loses −0.168 dB there — the σ=0.1
        # box drops real density tails that longer out-of-box paths see)
        ("carry 64+128 thr.05",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",
                     "occupancy.sigma_threshold=0.05"))),
        ("carry 64+128 thr.02",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",
                     "occupancy.sigma_threshold=0.02"))),
        ("carry 64+128 mw.25",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",
                     "occupancy.margin_world=0.25"))),
        ("carry 64+128 thr.02 mw.25",
         dict(n_coarse=64, n_fine=128, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true",
                     "occupancy.sigma_threshold=0.02",
                     "occupancy.margin_world=0.25"))),
        ("blockwise carry 32+64 SB=64",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3",
                     "kernels.block_samples=64"))),
        ("blockwise carry 64+64 SB=64",
         dict(n_coarse=64, n_fine=64, occ_on=True, blockwise=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3",
                     "kernels.block_samples=64"))),
        # r4 frontier: 64-sample fine budget (every +SB of budget costs a
        # whole block-program per tile — the measured throughput cliff, so
        # the game is quality at budget 64). mix = uniform PDF floor
        # (defensive sampling: coverage inside the same budget)
        ("proposal p64+f64 mix.25 dil2",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.25"))),
        ("proposal p64+f64 mix.25 dil2 w192L8",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.25", "proposal.net_width=192",
                     "proposal.posenc_xyz=8",
                     "proposal.distill_steps=1500"))),
        ("proposal p64+f64 mix.2 dil2 w192L8",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.2", "proposal.net_width=192",
                     "proposal.posenc_xyz=8",
                     "proposal.distill_steps=1500"))),
        ("proposal p64+f64 mix.2 dil2 ds2000",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.2",
                     "proposal.distill_steps=2000"))),
        ("proposal p64+f64 mix.4 dil2",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.4"))),
        ("proposal p64+f64 mix.15 dil1",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=0", "proposal.dilate=1",
                     "proposal.uniform_mix=0.15"))),
        ("proposal p64+f48+cov16 dil2",
         dict(n_coarse=32, n_fine=48, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16", "proposal.dilate=2"))),
        ("proposal p32+f48+cov16 dil2",
         dict(n_coarse=32, n_fine=48, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=32",
                     "proposal.cov_n=16", "proposal.dilate=2"))),
        ("proposal p32+f64 mix.25 dil2",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=32",
                     "proposal.cov_n=0", "proposal.dilate=2",
                     "proposal.uniform_mix=0.25"))),
        ("proposal p64+f64+cov16",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16"))),
        ("proposal p64+f64+cov16 dil0",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16", "proposal.dilate=0"))),
        ("proposal p64+f64+cov16 dil2",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16", "proposal.dilate=2"))),
        ("proposal p64+f64+cov16 ds1500",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16", "proposal.distill_steps=1500"))),
        ("proposal p64+f64+cov16 w256d3",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16", "proposal.net_width=256",
                     "proposal.net_depth=3", "proposal.posenc_xyz=8",
                     "proposal.distill_steps=1500"))),
        ("proposal p64+f64+cov8",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=8"))),
        ("proposal p64+f64+cov32",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=32"))),
        ("proposal p64+f48+cov16",
         dict(n_coarse=32, n_fine=48, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16"))),
        ("proposal p64+f32+cov16",
         dict(n_coarse=32, n_fine=32, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.cov_n=16"))),
        ("proposal p64+f64 union",
         dict(n_coarse=32, n_fine=64, occ_on=True, blockwise=True,
              proposal=True,
              extra=("kernels.fused_carry=true", "occupancy.macro=8",
                     "kernels.early_term_eps=1e-3", "proposal.eval_n=64",
                     "proposal.union=true"))),
    ]
    wanted = [s.strip() for s in args.only.split(",") if s.strip()]
    gt_j = jnp.asarray(gt)
    dense = None
    print(f"\n{'path':26s} {'PSNR vs GT':>12s} {'PSNR vs dense':>14s}",
          flush=True)
    d_gt = None
    for name, kw in specs:
        if wanted and not any(w in name for w in wanted) \
                and name != "dense 64+128":
            continue
        img = render(**kw)
        vs_gt = float(psnr(jnp.asarray(img), gt_j))
        if name == "dense 64+128":
            dense, d_gt = img, vs_gt
            print(f"{name:26s} {vs_gt:12.2f} {'—':>14s}", flush=True)
            continue
        vs_dense = (float(psnr(jnp.asarray(img), jnp.asarray(dense)))
                    if dense is not None else float("nan"))
        delta = (vs_gt - d_gt) if d_gt is not None else float("nan")
        print(f"{name:26s} {vs_gt:12.2f} {vs_dense:14.2f}   "
              f"delta-vs-dense {delta:+.3f} dB", flush=True)


if __name__ == "__main__":
    main()
