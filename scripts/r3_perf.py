#!/usr/bin/env python
"""r3 throughput sweep on the committed trained ckpt: two-stage vs
carry-in-VMEM march, full vs reduced budget, macro-box vs global-AABB
culling. One JSON line per variant (run_bench rows).

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r3_perf.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    from fashion_nerf.bench import run_bench
    from fashion_nerf.config import load_config

    variants = [
        ("two-stage 64+128 macro4", []),
        ("carry 64+128 macro4", ["kernels.fused_carry=true"]),
        ("two-stage 32+64 macro4", ["sampling.n_coarse=32",
                                    "sampling.n_fine=64"]),
        ("carry 32+64 macro4", ["kernels.fused_carry=true",
                                "sampling.n_coarse=32",
                                "sampling.n_fine=64"]),
        ("two-stage 64+128 macro1", ["occupancy.macro=1"]),
        ("carry 16+32 macro4", ["kernels.fused_carry=true",
                                "sampling.n_coarse=16",
                                "sampling.n_fine=32"]),
    ]
    for name, ovr in variants:
        cfg = load_config("blender_lego", ovr)
        row = run_bench(cfg, iters=3)
        row["variant"] = name
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
