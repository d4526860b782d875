"""L5 — dataset loaders + ray pipeline (SURVEY.md §2.2)."""

from fashion_nerf.data.tiny import load_tiny
from fashion_nerf.data.synthetic import make_synthetic_scene
from fashion_nerf.data.pipeline import RayDataset, prefetch_to_device

__all__ = ["load_tiny", "make_synthetic_scene", "RayDataset",
           "prefetch_to_device"]
