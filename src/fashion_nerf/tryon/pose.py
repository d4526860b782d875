"""OpenPose keypoints → rasterized conditioning maps — BASELINE.json:5.

18/25-keypoint JSON becomes per-joint Gaussian heatmaps and limb stick maps
on the image grid, fully vectorized jnp (no PIL drawing).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# OpenPose BODY_18 limb pairs [EXT]
LIMBS_18 = (
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
    (1, 8), (8, 9), (9, 10), (1, 11), (11, 12), (12, 13),
    (0, 14), (14, 16), (0, 15), (15, 17),
)


def rasterize_keypoints(kpts, H: int, W: int, sigma: float = 3.0):
    """kpts (J, 3) of (x, y, confidence) in pixels → (H, W, J) Gaussian
    heatmaps; zero-confidence joints produce zero maps."""
    kpts = jnp.asarray(kpts, jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]     # (H,1,1)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]     # (1,W,1)
    dx = xs - kpts[None, None, :, 0]
    dy = ys - kpts[None, None, :, 1]
    d2 = dx * dx + dy * dy                                    # (H, W, J)
    heat = jnp.exp(-d2 / (2.0 * sigma * sigma))
    conf = (kpts[:, 2] > 0).astype(jnp.float32)
    return heat * conf[None, None, :]


def limb_maps(kpts, H: int, W: int, limbs=LIMBS_18, width: float = 4.0):
    """(H, W, len(limbs)) stick maps: 1 within `width` px of each limb
    segment (both endpoints must be confident)."""
    kpts = jnp.asarray(kpts, jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    maps = []
    for a, b in limbs:
        pa, pb = kpts[a], kpts[b]
        ok = (pa[2] > 0) & (pb[2] > 0)
        d = pb[:2] - pa[:2]
        len2 = jnp.maximum(jnp.sum(d * d), 1e-8)
        # project each pixel onto the segment, clamp t∈[0,1]
        px = xs - pa[0]
        py = ys - pa[1]
        t = jnp.clip((px * d[0] + py * d[1]) / len2, 0.0, 1.0)
        cx = pa[0] + t * d[0]
        cy = pa[1] + t * d[1]
        dist2 = (xs - cx) ** 2 + (ys - cy) ** 2
        m = (dist2 <= width * width).astype(jnp.float32)
        maps.append(m * ok.astype(jnp.float32))
    return jnp.stack(maps, axis=-1)


def load_openpose_json(obj) -> np.ndarray:
    """Parse an OpenPose JSON dict (or people list) → (J, 3) float array of
    the first person's body keypoints."""
    if isinstance(obj, dict):
        people = obj.get("people", [])
    else:
        people = obj
    if not people:
        return np.zeros((18, 3), np.float32)
    flat = np.asarray(people[0]["pose_keypoints_2d"], np.float32)
    return flat.reshape(-1, 3)
