from fashion_nerf.render.renderer import render_rays, render_image, render_path

__all__ = ["render_rays", "render_image", "render_path"]
