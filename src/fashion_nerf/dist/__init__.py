from fashion_nerf.dist.mesh import (make_mesh, ray_sharding, replicated,
                                    param_shardings, init_distributed)

__all__ = ["make_mesh", "ray_sharding", "replicated", "param_shardings",
           "init_distributed"]
