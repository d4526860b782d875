"""L5 — garment try-on preprocessing (BASELINE.json:5,10).

"person segmentation masks, TPS/flow cloth warps, pose-keypoint
rasterization — moves from PIL/OpenCV to XLA image ops with device-side
prefetch". Everything here is pure jnp (jit-safe, static shapes): resize,
morphology via reduce_window, TPS linear solve, bilinear grid_sample,
Gaussian keypoint splats.
"""

from fashion_nerf.tryon.segmentation import parse_to_masks, make_agnostic
from fashion_nerf.tryon.tps import fit_tps, tps_grid, grid_sample, tps_warp
from fashion_nerf.tryon.flow import flow_warp
from fashion_nerf.tryon.pose import rasterize_keypoints, limb_maps

__all__ = ["parse_to_masks", "make_agnostic", "fit_tps", "tps_grid",
           "grid_sample", "tps_warp", "flow_warp", "rasterize_keypoints",
           "limb_maps"]
