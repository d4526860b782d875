"""L2 — radiance fields (SURVEY.md §2.1).

All fields expose one calling convention (the "field function"):

    field(params, pts: (R,S,3), viewdirs: (R,3)|None, cond: dict) -> (rgb, sigma)

with rgb (R,S,3) post-sigmoid and sigma (R,S) raw (pre-activation). The
Pallas fused posenc+MLP kernel implements the same signature, so the renderer
is agnostic to which substrate evaluates the field.
"""

from fashion_nerf.models.nerf_mlp import NeRFMLP, make_field, init_field
from fashion_nerf.models.latents import LatentTable

__all__ = ["NeRFMLP", "make_field", "init_field", "LatentTable"]
