#!/usr/bin/env python
"""Post-slim whole-frame profile (VERDICT r4 next #1 "starting gun").

Renders ONE bench frame at the shipped flagship defaults under
jax.profiler.trace and aggregates device-op durations from the resulting
.trace.json.gz, so the remaining 0.33 s/frame is attributed by kernel
(slim fine march vs σ-proposal march vs PDF/glue fusions) instead of
guessed. Microbenches under ~4 ms are dispatch noise on this tunnel
(CLAUDE.md); whole-frame traces are the trustworthy instrument.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/r5_profile.py \
        [--overrides render.eval_n_fine=64 ...]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))

TRACE_DIR = "/tmp/r5_trace"


def render_one_frame(overrides):
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fashion_nerf.bench import _bench_params
    from fashion_nerf.config import load_config
    from fashion_nerf.core.occupancy import build_jit
    from fashion_nerf.models.proposal import attach_proposal
    from fashion_nerf.render.blockwise import render_image_blockwise
    from fashion_nerf.train.loop import make_fields

    cfg = load_config("blender_lego", overrides)
    params, trained = _bench_params(cfg)
    assert trained, "profile needs the trained flagship asset"
    _, field_f = make_fields(cfg)
    occ = build_jit(cfg, field_f, params["fine"])
    params = attach_proposal(cfg, params, occ=occ)
    H = W = 800
    focal = 0.5 * W / np.tan(0.5 * 0.6911)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 4.0
    render = jax.jit(lambda pose: render_image_blockwise(
        params, cfg, H, W, focal, pose, occ=occ)["rgb"])
    pose = jnp.asarray(c2w)
    float(render(pose)[0, 0, 0])          # compile + warm
    with jax.profiler.trace(TRACE_DIR):
        float(render(pose)[0, 0, 0])      # the traced frame


def aggregate():
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace files under {TRACE_DIR}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pick pids whose process_name mentions TPU/device —
    # host-side python/runtime tracks would double-count the frame
    proc = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    by_name = collections.Counter()
    n_evt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"].split(".")[0][:70]
        by_name[name] += e["dur"]
        n_evt[name] += 1
        total += e["dur"]
    print(f"trace: {path}")
    print(f"device pids: { {p: proc[p] for p in dev_pids} }")
    print(f"{'us_total':>12} {'count':>7} {'us/call':>9}  op")
    for name, us in by_name.most_common(30):
        print(f"{us:12.0f} {n_evt[name]:7d} {us / n_evt[name]:9.1f}  {name}")
    print(f"{total:12.0f} {'':7} {'':9}  TOTAL device us")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--overrides", nargs="*", default=[])
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        render_one_frame(list(args.overrides))
    aggregate()


if __name__ == "__main__":
    main()
