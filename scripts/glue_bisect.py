#!/usr/bin/env python
"""Bisect the blockwise live/dead-chunk wall time into components on the
real chip: field kernel vs carry glue vs resample/sort vs dispatch RTT.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/glue_bisect.py
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
    from fashion_nerf.core.occupancy import build_jit
    from fashion_nerf.core.sampling import sample_pdf
    from fashion_nerf.kernels.posenc_mlp_pallas import make_fused_field
    import fashion_nerf.render.blockwise as BW

    params, _ = load_flagship()
    cfg = load_config("blender_lego", ["kernels.use_pallas=true"])
    fused = make_fused_field(cfg)
    occ = build_jit(cfg, fused, params["fine"])

    H = W = 800
    focal = 0.5 * W / np.tan(0.5 * 0.6911)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    center = (ro[336 * 800:336 * 800 + 32768], rd[336 * 800:336 * 800 + 32768])
    top = (ro[:32768], rd[:32768])

    def bench(label, fn, *args, iters=10):
        out = fn(*args)                      # compile
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])           # one sync for the whole batch
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:44s} {dt:8.2f} ms", flush=True)
        return dt

    # 0. dispatch floor: a trivial jitted fn on the same-size inputs
    bench("dispatch floor (noop jit)",
          jax.jit(lambda o, d: o[0, 0] + d[0, 0]), *center)

    # 1. full live / dead chunk
    full = jax.jit(lambda o, d: BW.render_rays_blockwise(
        params, cfg, o, d, d, occ=occ)["fine"]["rgb"])
    bench("full chunk (live)", full, *center)
    bench("full chunk (dead)", full, *top)

    # 2. glue only: stub the field evaluator with a cheap fill
    real_mbe = BW.__dict__.get("_orig_mbe")
    import fashion_nerf.kernels.posenc_mlp_pallas as K
    orig = K.make_block_evaluator

    def stub_mbe(cfg_):
        pack, hoist, hoist_c, _eval, rpt = orig(cfg_)

        def eval_stub(packed, dirpart, condpart, pts, alive):
            R, SB = pts.shape[0], pts.shape[1]
            s = jnp.sum(pts, axis=-1)
            return (jnp.stack([s, s, s], -1) * 0.1,
                    s * 0.0 - 1.0)           # sigma ≤ 0 → empty space

        return pack, hoist, hoist_c, eval_stub, rpt

    K.make_block_evaluator = stub_mbe
    BW.make_block_evaluator = stub_mbe
    try:
        glue = jax.jit(lambda o, d: BW.render_rays_blockwise(
            params, cfg, o, d, d, occ=occ)["fine"]["rgb"])
        bench("glue only (field stubbed, live geometry)", glue, *center)
    finally:
        K.make_block_evaluator = orig
        BW.make_block_evaluator = orig

    # 3. resample + union sort alone (the coarse→fine bridge)
    def resample_only(o, d):
        key = jax.random.PRNGKey(0)
        t_c = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (o.shape[0], 64))
        w = jnp.abs(jnp.sin(t_c[:, 1:-1]))
        t_mid = 0.5 * (t_c[:, 1:] + t_c[:, :-1])
        t_f = sample_pdf(key, t_mid, w[:, :62], 128, det=True)
        return jnp.sort(jnp.concatenate([t_c, t_f], -1), -1)

    bench("sample_pdf + union sort", jax.jit(resample_only), *center)

    # 4. union sort alone
    def sort_only(o, d):
        t = jax.random.uniform(jax.random.PRNGKey(0), (o.shape[0], 224))
        return jnp.sort(t, -1)

    bench("224-wide sort alone", jax.jit(sort_only), *center)


if __name__ == "__main__":
    main()
