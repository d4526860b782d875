#!/usr/bin/env python
"""Carry-path glue bisect (r3 frame anatomy follow-up): time each stage of
a LIVE chunk of the production render separately on the chip —
multi-AABB, stratified sampling, block-hit flags, the coarse/fine carry
marches, and the resample+union-sort bridge — to rank the non-MLP half of
the 0.47 s frame for the next round.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r3_glue_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fashion_nerf.assets import load_flagship
    from fashion_nerf.config import load_config
    from fashion_nerf.core.cameras import generate_rays
    from fashion_nerf.core.occupancy import build_jit, ray_multi_aabb
    from fashion_nerf.core.sampling import sample_pdf, stratified_sample
    from fashion_nerf.kernels.posenc_mlp_pallas import (make_block_evaluator,
                                                        make_fused_field)
    from fashion_nerf.render.blockwise import (_block_hit_flags,
                                               _pass_dists,
                                               render_rays_blockwise)

    params, _ = load_flagship()
    cfg = load_config("blender_lego")
    fused = make_fused_field(cfg)
    occ = build_jit(cfg, fused, params["fine"])
    H = W = 800
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    # a live, object-covering chunk at the production chunk size
    R = cfg.render.chunk
    mid = (H // 2) * W
    o, d = ro[mid:mid + R], rd[mid:mid + R]

    n_c = cfg.render.eval_n_coarse or cfg.sampling.n_coarse
    n_f = cfg.render.eval_n_fine or cfg.sampling.n_fine
    SB = cfg.kernels.block_samples

    def bench(label, fn, *args, iters=20):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:42s} {dt:8.2f} ms", flush=True)
        return dt

    bench("dispatch floor (noop jit)",
          jax.jit(lambda o, d: o[0, 0] + d[0, 0]), o, d)

    full = jax.jit(lambda o, d: render_rays_blockwise(
        params, cfg, o, d, d, occ=occ)["fine"]["rgb"])
    t_full = bench("full live chunk", full, o, d)

    @jax.jit
    def aabb_only(o, d):
        return ray_multi_aabb(o, d, occ, 2.0, 6.0)[0]
    bench("ray_multi_aabb (K=512)", aabb_only, o, d)

    @jax.jit
    def sample_only(o, d):
        lo, hi, hit, *_ = ray_multi_aabb(o, d, occ, 2.0, 6.0)
        return stratified_sample(jax.random.PRNGKey(0), lo, hi, R, n_c,
                                 perturb=False)
    bench("+ stratified coarse", sample_only, o, d)

    @jax.jit
    def bhit_only(o, d):
        lo, hi, hit, s_lo, s_hi, s_hit = ray_multi_aabb(o, d, occ, 2.0, 6.0)
        t_c = stratified_sample(jax.random.PRNGKey(0), lo, hi, R, n_c,
                                perturb=False)
        dnorm = jnp.linalg.norm(d, axis=-1, keepdims=True)
        t_pad, d_pad = _pass_dists(t_c, dnorm, 6.0, SB)
        return _block_hit_flags(t_pad, SB, (s_lo, s_hi, s_hit), R,
                                t_pad.shape[1] // SB)
    bench("+ pass dists + block_hit", bhit_only, o, d)

    @jax.jit
    def resample_only(o, d):
        t_c = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_c), (R, n_c))
        w = jnp.abs(jnp.sin(t_c[:, 1:-1] * 3.0))
        t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
        t_f = sample_pdf(jax.random.PRNGKey(0), t_mid, w, n_f, det=True)
        return jnp.sort(jnp.concatenate([t_c, t_f], -1), -1)
    bench("resample + union sort", resample_only, o, d)

    # coarse-only march (cuts the fine pass + bridge out of the full path)
    import dataclasses
    cfg_c = dataclasses.replace(cfg, sampling=dataclasses.replace(
        cfg.sampling, n_fine=0),
        render=dataclasses.replace(cfg.render, eval_n_fine=0))
    coarse_only = jax.jit(lambda o, d: render_rays_blockwise(
        params, cfg_c, o, d, d, occ=occ)["coarse"]["rgb"])
    t_coarse = bench("coarse-only march (full path, n_f=0)", coarse_only,
                     o, d)
    print(f"\nfull {t_full:.1f} ms = coarse-only {t_coarse:.1f} "
          f"+ fine/bridge {t_full - t_coarse:.1f}")


if __name__ == "__main__":
    main()
