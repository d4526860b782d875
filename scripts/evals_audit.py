#!/usr/bin/env python
"""Executed evals/ray vs the per-ray ideal on the bench frame (VERDICT r3
#2 done-criterion: report both). `alive_frac` counts the (tile, block)
field launches the carry march actually executed; `ideal_frac` counts the
(ray, block) pairs a perfect ray-compaction scheme would execute (hit ∧
block-interval ∧ transmittance > ε at per-ray granularity). The ratio is
the ceiling any gather/scatter compaction pass could win — measured r4:
frame-level hit-first compaction was a WASH (−0.9%), consistent with this
audit's small executed/ideal gap (8×8 pixel tiles are spatially coherent).

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/evals_audit.py
"""

import os
import sys

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
    from fashion_nerf.models.nerf_mlp import make_field
    from fashion_nerf.models.proposal import attach_proposal
    from fashion_nerf.render.blockwise import (_tile_order,
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
    ro, rd = generate_rays(H, W, focal, jnp.asarray(c2w))
    ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
    order, _ = _tile_order(H, W)
    ro, rd = ro[jnp.asarray(order)], rd[jnp.asarray(order)]

    R = cfg.render.chunk
    n_chunks = ro.shape[0] // R          # trailing partial dropped (audit)

    @jax.jit
    def chunk_stats(o, d):
        out = render_rays_blockwise(params, cfg, o, d, d, occ=occ)
        f = out["fine"]
        c = out["coarse"]
        return jnp.stack([f["alive_frac"], f["ideal_frac"],
                          c["alive_frac"], c["ideal_frac"]])

    n_f = cfg.render.eval_n_fine or cfg.sampling.n_fine
    n_p = cfg.proposal.eval_n or cfg.render.eval_n_coarse
    SB = cfg.kernels.block_samples
    p_sb = cfg.proposal.block_samples or SB
    s_pad_f = -(-n_f // SB) * SB
    s_pad_p = -(-n_p // p_sb) * p_sb

    rows = []
    for i in range(n_chunks):
        s = chunk_stats(ro[i * R:(i + 1) * R], rd[i * R:(i + 1) * R])
        rows.append(np.asarray(s))
    rows = np.stack(rows)                       # (n_chunks, 4)
    exec_f, ideal_f = rows[:, 0].mean() * s_pad_f, rows[:, 1].mean() * s_pad_f
    exec_p, ideal_p = rows[:, 2].mean() * s_pad_p, rows[:, 3].mean() * s_pad_p
    print(f"frame ({n_chunks} chunks of {R}, budget prop {n_p} + fine "
          f"{n_f}, SB={SB}):")
    print(f"  fine (8x256) executed {exec_f:.1f} evals/ray vs per-ray "
          f"ideal {ideal_f:.1f}  (overhead {exec_f / ideal_f:.2f}x)")
    print(f"  prop (2x128) executed {exec_p:.1f} evals/ray vs per-ray "
          f"ideal {ideal_p:.1f}  (overhead {exec_p / ideal_p:.2f}x)")


if __name__ == "__main__":
    main()
