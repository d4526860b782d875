#!/usr/bin/env python
"""Distill the flagship proposal net on the chip and commit it to
assets/proposal_synthetic.npz (models/proposal.py). bench/CLI render setup
loads it when its meta matches (config name, teacher fingerprint, arch);
otherwise they re-distill on the fly.

    PYTHONPATH=/root/repo/src:$PYTHONPATH python scripts/make_proposal_asset.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))


def main():
    import jax

    from fashion_nerf.assets import load_flagship
    from fashion_nerf.config import load_config
    from fashion_nerf.core.occupancy import build_jit
    from fashion_nerf.models.nerf_mlp import make_field
    from fashion_nerf.models.proposal import (attach_proposal,
                                              save_proposal_asset)

    cfg = load_config("blender_lego")
    params, meta = load_flagship()
    _, field = make_field(cfg.model)
    occ = build_jit(cfg, field, params["fine"])
    with_prop = attach_proposal(cfg, dict(params), occ=occ,
                                use_asset=False)
    path = save_proposal_asset(cfg, with_prop["proposal"], params["fine"])
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
