"""fashion_nerf — TPU-native neural-rendering and garment try-on framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
momolefe24/Fashion-NeRF (reference snapshot: /root/reference/README.md:1-2 —
title-only at v1; capability contract per BASELINE.json:5 and SURVEY.md).

Layers (SURVEY.md §1):
  L0 core/     — cameras, positional encoding, sampling, volume rendering
  L1 kernels/  — Pallas TPU kernels (fused posenc+MLP, fused ray march, CDF resample)
  L2 models/   — NeRF MLP fields (coarse/fine), garment-conditioned, latent-code
  L3 render/   — chunked ray/image/path renderers
  L4 train/    — pjit'd train step, optimizer, eval loop
  L5 data/, tryon/ — dataset loaders + XLA garment preprocessing
  L6 dist/     — mesh construction + sharding rules (DP over rays)
  L7 config.py, cli.py
  L8 metrics.py, logging_.py, ckpt.py
"""

__version__ = "0.1.0"
