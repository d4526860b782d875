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
                    help="cache file for the analytic GT render")
    args = ap.parse_args()

    H = W = 800
    params, meta = load_flagship()
    print({k: (v.item() if getattr(v, 'ndim', 1) == 0 else str(v))
           for k, v in meta.items()}, flush=True)

    # python float, NOT np.float64: an f64 scalar here promotes every GT
    # array to f64 and NumPy's f64 sin/exp drop to scalar libm — measured
    # 100x slower on the textured scene (r3)
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    # analytic GT in row strips — a whole-image 800×800×512-sample pts array
    # is ~4 GB and thrashes the host
    from fashion_nerf.data.synthetic import field_np
    scene_scale = float(meta.get("scene_scale", 1.0))
    scene_sharp = float(meta.get("scene_sharp", 25.0))
    scene_texture = float(meta.get("scene_texture", 0.0))

    def gt_render(n_samples=512, near=2.0, far=6.0, strip=50):
        """Analytic GT under one jit on the device (field_jnp docstring:
        the single-core host makes the NumPy sweep ~30 min; this is
        seconds). Strips via lax.map bound memory."""
        from fashion_nerf.data.synthetic import field_jnp

        c2w_j = jnp.asarray(c2w)

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

    cache_key = f"{scene_scale}_{scene_sharp}_{scene_texture}"
    gt = None
    if args.gt_cache and os.path.exists(args.gt_cache):
        with np.load(args.gt_cache, allow_pickle=False) as z:
            if "key" in z.files and str(z["key"]) == cache_key:
                gt = z["gt"]
                print(f"(GT from cache {args.gt_cache})", flush=True)
    if gt is None:
        gt = gt_render()
        if args.gt_cache:
            np.savez_compressed(args.gt_cache, gt=gt, key=cache_key)
    print("GT ready", flush=True)

    _prop_cache = {}

    def render(n_coarse, n_fine, occ_on, blockwise=False, extra=(),
               proposal=False):
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
        if blockwise:
            from fashion_nerf.render.blockwise import render_image_blockwise
            img = jax.jit(lambda pose: render_image_blockwise(
                rparams, cfg, H, W, focal, pose, occ=occ)["rgb"])(
                    jnp.asarray(c2w))
        else:
            img = jax.jit(lambda pose: render_image(
                fc, ff, H, W, focal, pose, cfg, occ=occ)["rgb"])(
                    jnp.asarray(c2w))
        float(img[0, 0, 0])   # sync through the tunnel
        return np.asarray(img)

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
