#!/usr/bin/env python
"""r4 frame anatomy at the proposal-path default (p64 cheap + f64 full,
SB=32): per-stage timings of one live chunk (the two carry marches, the
PDF bridge, the culling precomputes) plus whole-frame chunk liveness — to
rank what is left of the 0.40 s frame.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r4_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    import functools
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fashion_nerf.assets import load_flagship
    from fashion_nerf.config import load_config
    from fashion_nerf.core.cameras import generate_rays
    from fashion_nerf.core.occupancy import (build_jit, ray_aabb_intersect,
                                             ray_multi_aabb)
    from fashion_nerf.core.sampling import sample_pdf, stratified_sample
    from fashion_nerf.kernels.posenc_mlp_pallas import (make_block_evaluator,
                                                        make_fused_field)
    from fashion_nerf.models.proposal import (attach_proposal,
                                              proposal_model_config)
    from fashion_nerf.render.blockwise import (_block_hit_flags,
                                               _marched_pass_carry,
                                               _pass_dists, _tile_order,
                                               render_rays_blockwise)

    params, _ = load_flagship()
    cfg = load_config("blender_lego")
    fused = make_fused_field(cfg)
    occ = build_jit(cfg, fused, params["fine"])
    params = attach_proposal(cfg, dict(params), occ=occ)
    H = W = 800
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    order, _inv = _tile_order(H, W)
    ro, rd = ro[jnp.asarray(order)], rd[jnp.asarray(order)]

    R = cfg.render.chunk
    n_f = cfg.render.eval_n_fine or cfg.sampling.n_fine
    n_p = cfg.proposal.eval_n
    SB = cfg.kernels.block_samples

    # whole-frame chunk liveness at the production chunking
    n = ro.shape[0]
    n_chunks = n // R          # trailing partial chunk dropped (stats only)
    _, _, hit = ray_aabb_intersect(ro, rd, occ.box_min, occ.box_max,
                                   2.0, 6.0)
    hitc = np.asarray(hit)[:n_chunks * R].reshape(n_chunks, R)
    live = hitc.any(1)
    frac = hitc.mean(1)
    print(f"frame: {n_chunks} chunks of {R}; live {live.sum()} "
          f"({live.mean()*100:.0f}%), hit rays {hitc.mean()*100:.1f}%, "
          f"mean hit-frac in live chunks {frac[live].mean()*100:.1f}%",
          flush=True)

    # a live, object-covering chunk
    mid_idx = int(np.argmax(frac))
    o = ro[mid_idx * R:(mid_idx + 1) * R]
    d = rd[mid_idx * R:(mid_idx + 1) * R]
    print(f"bisect chunk hit-frac {frac[mid_idx]*100:.0f}%", flush=True)

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
        print(f"{label:44s} {dt:8.2f} ms", flush=True)
        return dt

    bench("dispatch floor (noop jit)",
          jax.jit(lambda o, d: o[0, 0] + d[0, 0]), o, d)

    full = jax.jit(lambda o, d: render_rays_blockwise(
        params, cfg, o, d, d, occ=occ)["fine"]["rgb"])
    t_full = bench("full live chunk (prop + fine)", full, o, d)

    # the two carry marches in isolation (same inputs the renderer builds)
    pm = proposal_model_config(cfg)
    pack, hoist_dirs, hoist_cond, _eb, _rpt = make_block_evaluator(cfg)
    p_pack, p_hd, _, _, _ = make_block_evaluator(cfg, mcfg=pm)
    packed_f = pack(params["fine"])
    packed_p = p_pack(params["proposal"])

    def pre(o, d):
        lo, hi, hit, s_lo, s_hi, s_hit = ray_multi_aabb(o, d, occ, 2.0, 6.0)
        dnorm = jnp.linalg.norm(d, axis=-1, keepdims=True)
        return lo, hi, hit, (s_lo, s_hi, s_hit), dnorm

    @jax.jit
    def prop_march(o, d):
        lo, hi, hit, seg, dnorm = pre(o, d)
        t_c = stratified_sample(jax.random.PRNGKey(0), lo, hi, R, n_p,
                                perturb=False)
        dirpart = p_hd(packed_p, d)
        return _marched_pass_carry(packed_p, dirpart, None, o, d, t_c,
                                   dnorm, hit, cfg, 6.0, seg=seg,
                                   L=pm.posenc_xyz)["weights"]
    t_prop = bench("proposal march (incl. AABB+strat)", prop_march, o, d)

    @jax.jit
    def fine_march(o, d):
        lo, hi, hit, seg, dnorm = pre(o, d)
        t_all = stratified_sample(jax.random.PRNGKey(0), lo, hi, R, n_f,
                                  perturb=False)
        dirpart = hoist_dirs(packed_f, d)
        return _marched_pass_carry(packed_f, dirpart, None, o, d, t_all,
                                   dnorm, hit, cfg, 6.0, seg=seg)["rgb"]
    t_fine = bench("fine march (incl. AABB+strat)", fine_march, o, d)

    @jax.jit
    def aabb_only(o, d):
        return ray_multi_aabb(o, d, occ, 2.0, 6.0)[0]
    t_aabb = bench("ray_multi_aabb (K=512)", aabb_only, o, d)

    @jax.jit
    def bridge(o, d):
        lo, hi, hit, seg, dnorm = pre(o, d)
        t_c = stratified_sample(jax.random.PRNGKey(0), lo, hi, R, n_p,
                                perturb=False)
        w = jnp.abs(jnp.sin(t_c[:, 1:-1] * 3.0))
        k = cfg.proposal.dilate
        B = w.shape[1]
        w_pad = jnp.pad(w, ((0, 0), (k, k)), mode="edge")
        w = jnp.max(jnp.stack([w_pad[:, i:i + B]
                               for i in range(2 * k + 1)], 0), 0)
        a = cfg.proposal.uniform_mix
        w = (1 - a) * w + a * jnp.mean(w, axis=-1, keepdims=True)
        t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
        t_f = sample_pdf(jax.random.PRNGKey(0), t_mid, w, n_f, det=True)
        return jnp.sort(t_f, axis=-1)
    t_bridge = bench("PDF bridge (dilate+mix+resample+sort)", bridge, o, d)

    print(f"\nfull {t_full:.1f} ms vs prop {t_prop:.1f} + fine {t_fine:.1f}"
          f" + bridge {t_bridge - t_aabb:.1f} (pre double-counted "
          f"~{t_aabb:.1f})", flush=True)
    est = live.sum() * t_full + (n_chunks - live.sum()) * 0.0
    print(f"frame estimate from live chunks alone: {est/1e3:.3f} s "
          f"(measured bench ~0.40 s)", flush=True)


if __name__ == "__main__":
    main()
