#!/usr/bin/env python
"""MFU attribution probe (VERDICT r2 weak #1): decompose the fused MLP's
79-vs-165 TFLOPs-equiv gap into its parts with minimal Pallas kernels at the
production tile shape (2048 rows, il=4, width 256, depth 8+heads).

Variants (all bf16 matmul inputs, f32 MXU accum, per-layer cast back):
  chain      : 9 chained 256x256 matmuls + bf16 cast only
  chain+relu : + relu between layers
  chain+skip : + the skip-layer split (3 matmuls on layer 5)
  full-ish   : + posenc phases at entry + padded heads (the real topology,
               minus alive flags / dirpart plumbing)

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/mfu_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))

TILE = 2048
IL = 4
W = 256
DEPTH = 9          # matmuls in the plain chain


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << 21
    key = jax.random.PRNGKey(0)
    Ws = [jax.random.normal(jax.random.fold_in(key, i), (W, W),
                            jnp.bfloat16) * 0.06 for i in range(DEPTH)]

    def run_variant(name, body, flops_row, extra_arrs=()):
        def kernel(x_ref, *refs):
            w_refs = refs[:-1]
            o_ref = refs[-1]
            ws = [r[:] for r in w_refs]
            half = TILE // IL
            for j in range(IL):
                sl = pl.ds(j * half, half)
                o_ref[sl, :] = body(x_ref[sl, :], ws)

        def const(a):
            return pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        arrs = list(Ws) + list(extra_arrs)

        @jax.jit
        def go(k):
            x = jax.random.normal(k, (n, W), jnp.bfloat16)
            out = pl.pallas_call(
                kernel,
                grid=(n // TILE,),
                in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [const(a) for a in arrs],
                out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
            )(x, *arrs)
            return out[0, 0]

        float(go(key))
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            out = go(jax.random.fold_in(key, i))
        float(out)
        dt = (time.perf_counter() - t0) / iters
        tf = n * flops_row / dt / 1e12
        print(f"{name:14s}: {dt*1e3:7.2f} ms  {tf:6.1f} TFLOPs-equiv",
              flush=True)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def chain(x, ws):
        h = x
        for Wk in ws[:DEPTH]:
            h = mm(h, Wk).astype(jnp.bfloat16)
        return mm(h, ws[0])           # final f32 out

    def chain_relu(x, ws):
        h = x
        for Wk in ws[:DEPTH]:
            h = jnp.maximum(mm(h, Wk), 0.0).astype(jnp.bfloat16)
        return mm(h, ws[0])

    def chain_f32_hold(x, ws):
        # keep h in f32 and cast only at the matmul INPUT (same math,
        # different cast placement — tests whether the relu-then-cast
        # chain serializes worse than cast-at-use)
        h = x
        for Wk in ws[:DEPTH]:
            h = jnp.maximum(mm(h.astype(jnp.bfloat16) if h.dtype
                               != jnp.bfloat16 else h, Wk), 0.0)
            h = h.astype(jnp.bfloat16)
        return mm(h, ws[0])

    flops = 2 * W * W * (DEPTH + 1)
    run_variant("chain", chain, flops)
    run_variant("chain+relu", chain_relu, flops)
    run_variant("chain f32hold", chain_f32_hold, flops)

    # two independent half-width streams inside each slice (more ILP than
    # the il row-split alone: two DIFFERENT weight chains in flight)
    def chain2(x, ws):
        h1, h2 = x, x
        for k in range(0, DEPTH - 1, 2):
            h1 = jnp.maximum(mm(h1, ws[k]), 0.0).astype(jnp.bfloat16)
            h2 = jnp.maximum(mm(h2, ws[k + 1]), 0.0).astype(jnp.bfloat16)
        return mm(h1, ws[0]) + mm(h2, ws[1])

    run_variant("2 streams", chain2, 2 * W * W * (DEPTH + 1))


if __name__ == "__main__" and "--shapes" not in sys.argv:
    main()


def shape_sweep():
    """Is ~80 TF the toolchain ceiling for THIS topology, or our bug?
    Sweep width and dependency structure of the bare chain."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 1 << 20
    key = jax.random.PRNGKey(0)

    def bench(name, width, depth, indep, tile=2048, il=4):
        Ws = [jax.random.normal(jax.random.fold_in(key, i), (width, width),
                                jnp.bfloat16) * 0.05 for i in range(depth)]

        def kernel(x_ref, *refs):
            w_refs = refs[:-1]
            o_ref = refs[-1]
            ws = [r[:] for r in w_refs]
            half = tile // il
            for j in range(il):
                sl = pl.ds(j * half, half)
                x = x_ref[sl, :]
                if indep:
                    acc = jnp.zeros((half, width), jnp.float32)
                    for Wk in ws:
                        acc += jnp.dot(x, Wk,
                                       preferred_element_type=jnp.float32)
                    o_ref[sl, :] = acc
                else:
                    h = x
                    for Wk in ws:
                        h = jnp.dot(h, Wk,
                                    preferred_element_type=jnp.float32
                                    ).astype(jnp.bfloat16)
                    o_ref[sl, :] = h.astype(jnp.float32)

        def const(a):
            return pl.BlockSpec(a.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        @jax.jit
        def go(k):
            x = jax.random.normal(k, (n, width), jnp.bfloat16)
            out = pl.pallas_call(
                kernel, grid=(n // tile,),
                in_specs=[pl.BlockSpec((tile, width), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
                + [const(a) for a in Ws],
                out_specs=pl.BlockSpec((tile, width), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, width), jnp.float32),
            )(x, *Ws)
            return out[0, 0]

        import time
        float(go(key))
        t0 = time.perf_counter()
        for i in range(10):
            out = go(jax.random.fold_in(key, i))
        float(out)
        dt = (time.perf_counter() - t0) / 10
        tf = n * 2 * width * width * depth / dt / 1e12
        print(f"{name:28s}: {dt*1e3:7.2f} ms  {tf:6.1f} TFLOPs-equiv",
              flush=True)

    bench("w256 d9 dependent", 256, 9, indep=False)
    bench("w256 d9 independent", 256, 9, indep=True)
    bench("w512 d9 dependent", 512, 9, indep=False, tile=1024)
    bench("w512 d9 independent", 512, 9, indep=True, tile=1024)
    bench("w256 d9 dep il=1 (M=2048)", 256, 9, indep=False, il=1)
    bench("w1024 d4 independent", 1024, 4, indep=True, tile=512)


if __name__ == "__main__" and "--shapes" in sys.argv:
    shape_sweep()
