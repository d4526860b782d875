"""L0 — pure-function core math on XLA (SURVEY.md §2.1).

Everything here is shape-static, jit-safe, and has no Pallas dependency; the
kernels/ package provides fused Pallas twins of the hot paths.
"""

from fashion_nerf.core.cameras import generate_rays, ndc_rays
from fashion_nerf.core.posenc import posenc, posenc_dim
from fashion_nerf.core.sampling import stratified_sample, sample_pdf
from fashion_nerf.core.volrend import volume_render

__all__ = [
    "generate_rays", "ndc_rays",
    "posenc", "posenc_dim",
    "stratified_sample", "sample_pdf",
    "volume_render",
]
