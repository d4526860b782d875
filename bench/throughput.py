#!/usr/bin/env python
"""Benchmark harness producing the SURVEY.md §6 table rows: render
rays/sec/chip at 800×800 (the BASELINE.json:2 north-star metric) AND
training throughput. One JSON line per row.

Usage: python bench/throughput.py [render|train|all] [k=v overrides ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    from fashion_nerf.bench import bench_train, run_bench
    from fashion_nerf.config import load_config

    which = "all"
    overrides = []
    for arg in sys.argv[1:]:
        if "=" in arg:
            overrides.append(arg)
        else:
            which = arg
    cfg = load_config(os.environ.get("BENCH_CONFIG", "blender_lego"),
                      overrides)
    if which in ("render", "all"):
        print(json.dumps(run_bench(cfg)))
    if which in ("train", "all"):
        print(json.dumps(bench_train(cfg)))


if __name__ == "__main__":
    main()
