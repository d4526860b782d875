"""Person-parse → masks + cloth-agnostic representation (BASELINE.json:5,10).

VITON-HD-style parse maps label pixels by body part [EXT]; here they become
one-hot/binary masks and the "agnostic" person image (garment region removed)
with pure-XLA morphology (erode/dilate = min/max reduce_window) — no
PIL/OpenCV at runtime, per the capability contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# canonical VITON-HD / LIP parse labels [EXT]
LABELS = {
    "background": 0, "hair": 2, "face": 13, "upper": 5, "dress": 6,
    "coat": 7, "pants": 9, "left_arm": 14, "right_arm": 15,
    "left_leg": 16, "right_leg": 17,
}
GARMENT_LABELS = (5, 6, 7)
SKIN_LABELS = (14, 15)
HEAD_LABELS = (2, 13)


def parse_to_masks(parse, garment_labels=GARMENT_LABELS):
    """parse (H, W) int → dict of f32 masks: garment, body, head, background."""
    parse = parse.astype(jnp.int32)

    def any_of(labels):
        m = jnp.zeros(parse.shape, jnp.bool_)
        for l in labels:
            m = m | (parse == l)
        return m.astype(jnp.float32)

    garment = any_of(garment_labels)
    head = any_of(HEAD_LABELS)
    background = (parse == 0).astype(jnp.float32)
    body = 1.0 - background
    return {"garment": garment, "body": body, "head": head,
            "background": background}


def dilate(mask, radius: int = 2):
    """Binary dilation via max reduce_window (XLA, jit-safe)."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(mask, -jnp.inf, jax.lax.max,
                                 (k, k), (1, 1), "SAME")


def erode(mask, radius: int = 2):
    k = 2 * radius + 1
    return jax.lax.reduce_window(mask, jnp.inf, jax.lax.min,
                                 (k, k), (1, 1), "SAME")


def make_agnostic(image, parse, dilate_radius: int = 3,
                  fill_value: float = 0.5):
    """Cloth-agnostic person representation [EXT: CP-VTON]: grey out a
    dilated garment region so the network cannot copy the original cloth.

    image (H, W, 3) f32, parse (H, W) int → (agnostic (H,W,3), masks dict).
    """
    masks = parse_to_masks(parse)
    g = dilate(masks["garment"], dilate_radius)
    agnostic = image * (1.0 - g[..., None]) + fill_value * g[..., None]
    return agnostic, masks


def resize_image(img, H: int, W: int, method: str = "bilinear"):
    """jax.image resize wrapper (device-side, replaces PIL.resize)."""
    out_shape = (H, W) + img.shape[2:]
    return jax.image.resize(img, out_shape, method=method)
