from fashion_nerf.dist.mesh import (make_mesh, ray_sharding, replicated,
                                    param_shardings, init_distributed)
from fashion_nerf.dist.segmented import segmented_ray_scan

__all__ = ["make_mesh", "ray_sharding", "replicated", "param_shardings",
           "init_distributed", "segmented_ray_scan"]
