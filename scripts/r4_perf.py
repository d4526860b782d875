#!/usr/bin/env python
"""r4 throughput sweep on the committed trained ckpt: σ-only proposal coarse
pass variants (budget / dilation) vs the r3 full-coarse baseline. One JSON
line per variant (run_bench rows).

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r4_perf.py
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
        ("r3 baseline (no proposal)", ["proposal.enabled=false"]),
        ("prop p64 f64 cov16 dil1", ["proposal.cov_n=16",
                                     "proposal.dilate=1"]),
        ("prop p64 f64 cov16 dil2", ["proposal.cov_n=16",
                                     "proposal.dilate=2"]),
        ("prop p64 f64 cov32 dil1", ["proposal.cov_n=32",
                                     "proposal.dilate=1"]),
        ("prop p64 f48 cov16 dil2", ["proposal.cov_n=16",
                                     "proposal.dilate=2",
                                     "render.eval_n_fine=48"]),
    ]
    for name, ovr in variants:
        cfg = load_config("blender_lego", ovr)
        row = run_bench(cfg, iters=3)
        row["variant"] = name
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
