#!/usr/bin/env python
"""Fused posenc+MLP kernel micro-benchmark (VERDICT r1 #3: close the
56 → 100+ TFLOPs-equiv MXU gap; pure matmul chains reach ~165 at width 256).

Sweeps kernel-shape variants (tile rows, interleave factor, accumulation
dtype) on the real chip and prints a TFLOPs-equiv table. Input rows are
generated on-device inside the jit (host uploads through the axon tunnel
would dominate otherwise — CLAUDE.md).

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/kernel_bench.py
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def flops_per_row(mcfg) -> float:
    """Real MACs×2 per sample row (excluding lane padding, matching the
    BASELINE.md TFLOPs-equiv convention)."""
    w, cx = mcfg.net_width, 3 * (2 * mcfg.posenc_xyz + 1)
    macs = cx * w                                   # first layer
    for i in range(1, mcfg.net_depth):
        fan_in = w + cx if i == min(mcfg.skips) + 1 else w
        macs += fan_in * w
    if mcfg.use_viewdirs:
        macs += w * 1 + w * w + w * (w // 2) + (w // 2) * 3
    else:
        macs += w * 4
    return 2.0 * macs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 21)   # 2M rows
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiles", default="1024,2048,4096")
    ap.add_argument("--interleaves", default="1,2,4")
    ap.add_argument("--accums", default="float32,bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fashion_nerf.config import load_config
    from fashion_nerf.kernels import posenc_mlp_pallas as K
    from fashion_nerf.models.nerf_mlp import init_field

    cfg = load_config("blender_lego")
    mcfg = cfg.model
    params = init_field(jax.random.PRNGKey(0), mcfg)
    arrs, plan, _dir_kernel, _cond_kernel = K.pack_params(params, mcfg)
    arrs = tuple(arrs)
    n = args.rows
    fl_row = flops_per_row(mcfg)
    print(f"rows={n}  flops/row={fl_row/1e6:.3f}M  "
          f"(width {mcfg.net_width}, depth {mcfg.net_depth})")

    results = []
    for tile, il, accum in itertools.product(
            [int(t) for t in args.tiles.split(",")],
            [int(i) for i in args.interleaves.split(",")],
            args.accums.split(",")):
        K._TILE, K._INTERLEAVE = tile, il
        K._ACCUM_DTYPE = accum
        K._fused_eval.clear_cache()

        @jax.jit
        def run(key):
            pts = jax.random.uniform(key, (n, 3), minval=-2, maxval=2)
            dirpart = jnp.zeros((n, 128), jnp.bfloat16)
            rgb, sigma = K._fused_eval(arrs, pts, dirpart, plan,
                                       mcfg.posenc_xyz)
            return rgb[0, 0] + sigma[0, 0]

        try:
            key = jax.random.PRNGKey(1)
            float(run(key))                      # compile + host sync
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = run(jax.random.fold_in(key, i))
            float(out)
            dt = (time.perf_counter() - t0) / args.iters
            tf = n * fl_row / dt / 1e12
            results.append((tf, tile, il, accum, dt))
            print(f"tile={tile:5d} interleave={il} accum={accum:9s}: "
                  f"{dt*1e3:7.2f} ms  {tf:6.1f} TFLOPs-equiv", flush=True)
        except Exception as e:
            print(f"tile={tile:5d} interleave={il} accum={accum:9s}: "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    if results:
        results.sort(reverse=True)
        tf, tile, il, accum, dt = results[0]
        print(f"\nbest: tile={tile} interleave={il} accum={accum} "
              f"→ {tf:.1f} TFLOPs-equiv ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
