#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures rays/sec/chip rendering 800×800 with the flagship coarse+fine
config (BASELINE.json:2). vs_baseline is the ratio to the 10M rays/sec/chip
north-star target (the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "src"))


def main():
    from fashion_nerf.bench import run_bench
    from fashion_nerf.config import load_config

    overrides = []
    # allow `python bench.py k=v ...` overrides (e.g. kernels.use_pallas=false)
    for arg in sys.argv[1:]:
        if "=" in arg:
            overrides.append(arg)
    cfg = load_config(os.environ.get("BENCH_CONFIG", "blender_lego"),
                      overrides)
    result = run_bench(cfg)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
