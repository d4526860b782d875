"""VITON-HD-style paired dataset loader — BASELINE.json:10 [EXT].

Canonical layout: root/{image, cloth, cloth-mask, image-parse, openpose-json}
with matching basenames. load_viton_pair reads one pair; load_viton_scene
assembles the garment-conditioned NeRF dataset (multi-view images of the
person + one garment conditioning stack shared across views).
"""

from __future__ import annotations

import json
import os

import numpy as np


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32) / 255.0


def _find(root: str, sub: str, stem: str, exts=(".jpg", ".png", ".jpeg")):
    for e in exts:
        p = os.path.join(root, sub, stem + e)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"{sub}/{stem}.* under {root}")


def load_viton_pair(root: str, pair_id: str) -> dict:
    """→ dict(image, cloth, cloth_mask, parse, keypoints)."""
    from fashion_nerf.tryon.pose import load_openpose_json

    image = _imread(_find(root, "image", pair_id))[..., :3]
    cloth = _imread(_find(root, "cloth", pair_id))[..., :3]
    cm = _imread(_find(root, "cloth-mask", pair_id))
    cloth_mask = (cm if cm.ndim == 2 else cm[..., 0])
    parse_img = _imread(_find(root, "image-parse", pair_id,
                              exts=(".png",)))
    # parse maps are palette PNGs; greyscale value == label after imread
    parse = (np.asarray(parse_img * 255.0, np.int32)
             if parse_img.ndim == 2 else
             np.asarray(parse_img[..., 0] * 255.0, np.int32))
    kp_path = os.path.join(root, "openpose-json",
                           pair_id + "_keypoints.json")
    if os.path.exists(kp_path):
        with open(kp_path) as f:
            keypoints = load_openpose_json(json.load(f))
    else:
        keypoints = np.zeros((18, 3), np.float32)
    return {"image": image, "cloth": cloth, "cloth_mask": cloth_mask,
            "parse": parse, "keypoints": keypoints}


def load_viton_scene(root: str, pair_id: str = "", n_views: int = 12,
                     H: int = 64, W: int = 64) -> dict:
    """Garment-conditioned NeRF dataset (BASELINE.json:10).

    With a VITON-HD root: loads the pair and builds the conditioning stack.
    Without one (hermetic/dev): synthesizes both the multi-view scene and a
    procedural garment pair so the config runs with zero downloads.
    """
    from fashion_nerf.data.synthetic import make_synthetic_scene
    from fashion_nerf.tryon.pipeline import build_conditioning

    scene = make_synthetic_scene(n_views=n_views, H=H, W=W)
    if root and os.path.isdir(os.path.join(root, "image")):
        ids = sorted(os.path.splitext(f)[0]
                     for f in os.listdir(os.path.join(root, "image")))
        pair = load_viton_pair(root, pair_id or ids[0])
    else:
        pair = synth_viton_pair(H, W)
    cond_stack = build_conditioning(pair, H, W)       # (H, W, C) numpy/jnp
    scene["garment"] = np.asarray(cond_stack, np.float32)
    scene["pair"] = pair
    return scene


def synth_viton_pair(H: int = 64, W: int = 64, seed: int = 0) -> dict:
    """Procedural VITON-style pair for hermetic tests (SURVEY.md §4.6)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # torso-ish ellipse as "person", upper half labeled garment
    cx, cy = W / 2, H / 2
    person = (((xx - cx) / (W * 0.25)) ** 2
              + ((yy - cy) / (H * 0.4)) ** 2) < 1.0
    parse = np.zeros((H, W), np.int32)
    parse[person] = 9                                   # pants default
    upper = person & (yy < cy)
    parse[upper] = 5                                    # upper garment
    head = person & (yy < cy - H * 0.3)
    parse[head] = 13
    image = np.full((H, W, 3), 0.9, np.float32)
    image[person] = [0.6, 0.45, 0.35]
    image[upper] = [0.2, 0.3, 0.8]
    # flat lay "cloth": rectangle with stripes
    cloth = np.full((H, W, 3), 1.0, np.float32)
    rect = (xx > W * 0.2) & (xx < W * 0.8) & (yy > H * 0.3) & (yy < H * 0.7)
    stripes = ((xx // 4) % 2).astype(bool)
    cloth[rect & stripes] = [0.8, 0.1, 0.2]
    cloth[rect & ~stripes] = [0.95, 0.85, 0.3]
    cloth_mask = rect.astype(np.float32)
    kpts = np.array([[cx, cy - H * 0.35, 1],            # nose-ish
                     [cx, cy - H * 0.2, 1],             # neck
                     [cx - W * 0.2, cy - H * 0.2, 1],   # r shoulder
                     [cx - W * 0.25, cy, 1],            # r elbow
                     [cx - W * 0.25, cy + H * 0.2, 1],  # r wrist
                     [cx + W * 0.2, cy - H * 0.2, 1],   # l shoulder
                     [cx + W * 0.25, cy, 1],
                     [cx + W * 0.25, cy + H * 0.2, 1]]
                    + [[0, 0, 0]] * 10, np.float32)
    return {"image": image, "cloth": cloth, "cloth_mask": cloth_mask,
            "parse": parse, "keypoints": kpts}
