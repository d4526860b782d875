#!/usr/bin/env python
"""r5 bench-pose throughput sweep: f64 re-admission via a finer proposal PDF
(VERDICT r4 next #2). The slim σ-only march (r4) made proposal rows cheap —
p128 @ SB=128 marches as ONE full-width 128-lane block — so doubling the
PDF bin count (the measured r4 quality floor was BIN COUNT, p48 failed) may
buy back the ~0.05 dB that forces f96 = 50% more fine rows.

Bench-pose rows only (fast triage); survivors go to the 7-pose gate.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r5_perf.py
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
        ("r5 defaults (p64 f96)", []),
        ("p64 f64", ["render.eval_n_fine=64"]),
        ("p128 f64", ["proposal.eval_n=128", "proposal.block_samples=128",
                      "render.eval_n_fine=64"]),
        ("p128 f64 dil3", ["proposal.eval_n=128",
                           "proposal.block_samples=128",
                           "render.eval_n_fine=64", "proposal.dilate=3"]),
        ("p128 f96", ["proposal.eval_n=128", "proposal.block_samples=128"]),
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for name, ovr in variants:
        if only and only not in name:
            continue
        cfg = load_config("blender_lego", ovr)
        row = run_bench(cfg, iters=3)
        row["variant"] = name
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
