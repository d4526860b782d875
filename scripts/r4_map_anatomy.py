#!/usr/bin/env python
"""Where does the frame spend the other half? (r4)

evals_audit/r4_bisect found: one live chunk under its own jit costs ~5.9 ms
and the bench frame has 52 live chunks (~0.31 s of chunk compute), yet the
frame measures 0.64 s. This script times controlled lax.map compositions of
the SAME live chunk to attribute the gap: map/scan sequencing, the lax.cond
branch, output stacking, or the tile-order (un)permute glue.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r4_map_anatomy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fashion_nerf.assets import load_flagship
    from fashion_nerf.config import load_config
    from fashion_nerf.core.cameras import generate_rays
    from fashion_nerf.core.occupancy import build_jit, ray_aabb_intersect
    from fashion_nerf.models.nerf_mlp import make_field
    from fashion_nerf.models.proposal import attach_proposal
    from fashion_nerf.render.blockwise import (_tile_order,
                                               render_image_blockwise,
                                               render_rays_blockwise)

    params, _ = load_flagship()
    cfg = load_config("blender_lego")
    _, field_f = make_field(cfg.model)
    occ = build_jit(cfg, field_f, params["fine"])
    params = attach_proposal(cfg, dict(params), occ=occ)

    H = W = 800
    focal = float(0.5 * W / np.tan(0.5 * 0.6911))
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    ro_all, rd_all = generate_rays(H, W, focal, jnp.asarray(c2w))
    ro_all, rd_all = ro_all.reshape(-1, 3), rd_all.reshape(-1, 3)
    order, _ = _tile_order(H, W)
    ro_all, rd_all = ro_all[jnp.asarray(order)], rd_all[jnp.asarray(order)]
    R = cfg.render.chunk

    # pick the busiest chunk (same recipe as r4_bisect)
    _, _, hit = ray_aabb_intersect(ro_all, rd_all, occ.box_min, occ.box_max,
                                   2.0, 6.0)
    n_chunks = ro_all.shape[0] // R
    hitc = np.asarray(hit)[:n_chunks * R].reshape(n_chunks, R)
    mid = int(np.argmax(hitc.mean(1)))
    o1 = ro_all[mid * R:(mid + 1) * R]
    d1 = rd_all[mid * R:(mid + 1) * R]

    def timeit(label, fn, *args, iters=8):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:52s} {dt:9.2f} ms", flush=True)
        return dt

    def live(o, d):
        out = render_rays_blockwise(params, cfg, o, d, d, occ=occ)
        f = out["fine"]
        return {k: f[k] for k in ("rgb", "depth", "acc", "disp")}

    one = jax.jit(live)
    t1 = timeit("one live chunk, own jit", one, o1, d1)

    N = 8
    oN = jnp.broadcast_to(o1, (N,) + o1.shape)
    dN = jnp.broadcast_to(d1, (N,) + d1.shape)

    mapN = jax.jit(lambda o, d: jax.lax.map(lambda ab: live(*ab), (o, d)))
    tN = timeit(f"lax.map over {N} copies (no cond)", mapN, oN, dN)
    print(f"  -> per chunk {tN / N:.2f} ms vs standalone {t1:.2f}")

    def chunk_cond(o, d):
        _, _, h = ray_aabb_intersect(o, d, occ.box_min, occ.box_max,
                                     2.0, 6.0)
        bg = 1.0

        def dead(o, d):
            n_r = o.shape[0]
            return {"rgb": jnp.full((n_r, 3), bg, jnp.float32),
                    "depth": jnp.zeros((n_r,), jnp.float32),
                    "acc": jnp.zeros((n_r,), jnp.float32),
                    "disp": jnp.full((n_r,), 1e10, jnp.float32)}
        return jax.lax.cond(jnp.any(h), live, dead, o, d)

    mapC = jax.jit(lambda o, d: jax.lax.map(lambda ab: chunk_cond(*ab),
                                            (o, d)))
    tC = timeit(f"lax.map over {N} copies (with cond)", mapC, oN, dN)
    print(f"  -> per chunk {tC / N:.2f} ms")

    # dead-chunk cost inside the map
    far_o = jnp.full_like(o1, 1e6)
    oD = jnp.concatenate([oN[:4], jnp.broadcast_to(far_o, (4,) + o1.shape)])
    tD = timeit("lax.map 4 live + 4 dead (with cond)", mapC, oD, dN)
    print(f"  -> dead-chunk cost {(tD - tC / 2 * 1):.2f} ... "
          f"(4 live should be ~{tC / 2:.1f})")

    # the production whole-frame path for reference
    frame = jax.jit(lambda pose: render_image_blockwise(
        params, cfg, H, W, focal, pose, occ=occ)["rgb"])
    tF = timeit("production frame (800x800)", frame, jnp.asarray(c2w),
                iters=3)
    print(f"  -> frame {tF:.1f} ms; {n_chunks} chunks", flush=True)


if __name__ == "__main__":
    main()
