"""Try-on preprocessing pipeline — SURVEY.md §3.3, BASELINE.json:5,10.

One device round-trip: decode on host → single device_put → XLA ops
(masks/agnostic → pose raster → TPS cloth warp) → the conditioning stack
that feeds GarmentEncoder/ConditionedNeRF. Also the `preprocess` CLI body.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fashion_nerf.tryon.pose import rasterize_keypoints
from fashion_nerf.tryon.segmentation import make_agnostic, resize_image
from fashion_nerf.tryon.tps import fit_tps, grid_sample, tps_grid


def garment_control_points(cloth_mask, k_side: int = 5):
    """Control points on the cloth-mask bounding box (K = 2·k_side, static
    shape): evenly spaced down the left and right edges. Classic GMM uses
    learned correspondences; with no trained matcher the box-to-torso map is
    the standard procedural stand-in."""
    ys = jnp.any(cloth_mask > 0.5, axis=1)
    xs = jnp.any(cloth_mask > 0.5, axis=0)
    H, W = cloth_mask.shape

    def bounds(v, n):
        idx = jnp.arange(n, dtype=jnp.float32)
        lo = jnp.min(jnp.where(v, idx, n * 1.0))
        hi = jnp.max(jnp.where(v, idx, -1.0))
        return lo, jnp.maximum(hi, lo + 1.0)

    y0, y1 = bounds(ys, H)
    x0, x1 = bounds(xs, W)
    t = jnp.linspace(0.0, 1.0, k_side)
    ys_pts = y0 + t * (y1 - y0)
    left = jnp.stack([jnp.full((k_side,), x0), ys_pts], -1)
    right = jnp.stack([jnp.full((k_side,), x1), ys_pts], -1)
    pts = jnp.concatenate([left, right], 0)              # (K, 2) pixels
    # → [-1, 1] normalized (x, y)
    return pts / jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]) - 1.0


def _vertical_bounds(mask):
    """(y0, y1) row bounds of a binary mask — masked reduces, no gather.
    Empty mask → centered third of the image (keeps the TPS solve finite)."""
    H = mask.shape[0]
    rows = jnp.any(mask > 0.5, axis=1)
    idx = jnp.arange(H, dtype=jnp.float32)
    has = jnp.any(rows)
    y0 = jnp.min(jnp.where(rows, idx, H * 1.0))
    y1 = jnp.max(jnp.where(rows, idx, -1.0))
    y0 = jnp.where(has, y0, H / 3.0)
    y1 = jnp.where(has, jnp.maximum(y1, y0 + 1.0), 2.0 * H / 3.0)
    return y0, y1


def _row_extents(mask, y_centers, band_h, k_rows: int):
    """Silhouette extents per row band: for each center yᵢ, the (left, mid,
    right) x-extents of the mask within rows [yᵢ−band_h, yᵢ+band_h].
    → (3·k_rows, 2) pixel points. Pure masked reductions (per-row gathers
    measure poorly on TPU — core/sampling.py). Empty band → centered probe
    points so downstream TPS stays well-posed."""
    H, W = mask.shape
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    cols = jnp.arange(W, dtype=jnp.float32)
    pts = []
    for i in range(k_rows):
        yc = y_centers[i]
        band = (rows >= yc - band_h) & (rows <= yc + band_h)
        m = jnp.any((mask > 0.5) & band, axis=0)                 # (W,)
        has = jnp.any(m)
        x0 = jnp.where(has, jnp.min(jnp.where(m, cols, W * 1.0)), W * 0.4)
        x1 = jnp.where(has, jnp.max(jnp.where(m, cols, -1.0)), W * 0.6)
        x1 = jnp.maximum(x1, x0 + 1.0)
        xm = 0.5 * (x0 + x1)
        for x in (x0, xm, x1):
            pts.append(jnp.stack([x, yc]))
    return jnp.stack(pts)                                        # (3k, 2)


def keypoint_grid_correspondences(cloth_mask, garment_mask, keypoints,
                                  H: int, W: int, k_rows: int = 6,
                                  ):
    """Keypoint-conditioned TPS correspondences (VERDICT r1 #10, [B]:10).

    Upgrades the bbox→torso-line stand-in: sources follow the CLOTH's per-row
    silhouette (captures taper, not just its bounding box); targets follow
    the per-row silhouette of the person's garment-parse region — the region
    the warped cloth must cover, which is exactly what CP-VTON's learned GMM
    approximates [EXT] — with the vertical span anchored by shoulder/hip
    keypoints (OpenPose ids 2/5, 8/11) blended with the parse bounds for
    robustness to either signal being noisy.

    Returns (src, dst): (3·k_rows, 2) each, normalized [-1, 1] (x, y).
    """
    kp = jnp.asarray(keypoints, jnp.float32)
    cy0, cy1 = _vertical_bounds(cloth_mask)
    gy0, gy1 = _vertical_bounds(garment_mask)

    sh_vis = jnp.stack([kp[2, 2] > 0, kp[5, 2] > 0])
    hip_vis = jnp.stack([kp[8, 2] > 0, kp[11, 2] > 0])
    sh_y = jnp.stack([kp[2, 1], kp[5, 1]])
    hip_y = jnp.stack([kp[8, 1], kp[11, 1]])
    y_sh = jnp.min(jnp.where(sh_vis, sh_y, H * 1.0))
    y_hip = jnp.max(jnp.where(hip_vis, hip_y, -1.0))
    # blend keypoint band with parse bounds (collars sit above shoulders;
    # parse may bleed below hips)
    y0t = jnp.where(jnp.any(sh_vis), 0.5 * (y_sh + gy0), gy0)
    y1t = jnp.where(jnp.any(hip_vis), 0.5 * (y_hip + gy1), gy1)
    y1t = jnp.maximum(y1t, y0t + 1.0)

    t = jnp.linspace(0.0, 1.0, k_rows)
    band_c = jnp.maximum((cy1 - cy0) / (2.0 * (k_rows - 1)), 1.0)
    band_t = jnp.maximum((y1t - y0t) / (2.0 * (k_rows - 1)), 1.0)
    src = _row_extents(cloth_mask, cy0 + t * (cy1 - cy0), band_c, k_rows)
    dst = _row_extents(garment_mask, y0t + t * (y1t - y0t), band_t, k_rows)
    norm = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
    return src / norm - 1.0, dst / norm - 1.0


def torso_targets(keypoints, H: int, W: int, k_side: int = 5):
    """Target control points from pose: interpolate shoulder→hip down each
    body side (OpenPose ids: 2/5 shoulders, 8/11 hips)."""
    kp = jnp.asarray(keypoints, jnp.float32)

    def side(sh, hip, fallback_x):
        ok = (kp[sh, 2] > 0) & (kp[hip, 2] > 0)
        a = jnp.where(ok, kp[sh, :2], jnp.array([fallback_x, H * 0.3]))
        b = jnp.where(ok, kp[hip, :2], jnp.array([fallback_x, H * 0.7]))
        t = jnp.linspace(0.0, 1.0, k_side)[:, None]
        return a + t * (b - a)                           # (k_side, 2)

    right = side(2, 8, W * 0.35)
    left = side(5, 11, W * 0.65)
    pts = jnp.concatenate([right, left], 0)              # (K, 2) pixels
    return pts / jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]) - 1.0


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _preprocess_device(image, cloth, cloth_mask, parse, keypoints,
                       H: int, W: int, matcher_params=None):
    """The single-dispatch XLA preprocessing graph.

    matcher_params: optional trained GarmentMatcher weights (tryon/
    matcher.py, VERDICT r3 #5) — when given, the TPS target points carry
    the learned residual (held-out warped-mask IoU 0.93 vs 0.65
    procedural); None is the exact zero-residual procedural limit."""
    image = resize_image(image, H, W)
    cloth = resize_image(cloth, H, W)
    cloth_mask = resize_image(cloth_mask[..., None], H, W)[..., 0]
    parse_f = resize_image(parse.astype(jnp.float32)[..., None], H, W,
                           method="nearest")[..., 0].astype(jnp.int32)

    agnostic, masks = make_agnostic(image, parse_f)
    heat = rasterize_keypoints(keypoints, H, W, sigma=max(2.0, H / 32))
    pose_map = jnp.max(heat, axis=-1, keepdims=True)     # (H, W, 1)

    # keypoint-conditioned silhouette correspondences (the bbox→torso-line
    # variant remains available as garment_control_points/torso_targets and
    # as the tests' improvement baseline)
    src, dst = keypoint_grid_correspondences(
        cloth_mask, masks["garment"], keypoints, H, W)
    if matcher_params is not None:
        # learned correspondence residual (late import: matcher.py imports
        # this module at top level)
        from fashion_nerf.tryon.matcher import GarmentMatcher
        person = jnp.concatenate(
            [agnostic, masks["garment"][..., None], pose_map], axis=-1)
        cl = jnp.concatenate([cloth, cloth_mask[..., None]], axis=-1)
        dst = dst + GarmentMatcher().apply(matcher_params, person, cl)
    # backward map: output(person frame) coords → cloth coords
    tps = fit_tps(dst, src)
    grid = tps_grid(tps, H, W)
    warped_cloth = grid_sample(cloth, grid, padding_value=1.0)
    warped_mask = grid_sample(cloth_mask[..., None], grid)[..., 0]

    cond = jnp.concatenate([
        warped_cloth,                                    # 3
        warped_mask[..., None],                          # 1
        masks["garment"][..., None],                     # 1
        masks["body"][..., None],                        # 1
        pose_map,                                        # 1
    ], axis=-1)                                          # (H, W, 7)
    return {
        "agnostic": agnostic, "warped_cloth": warped_cloth,
        "warped_mask": warped_mask, "pose_heat": heat, "cond": cond,
        "garment_mask": masks["garment"],
    }


def resolve_matcher(cfg=None):
    """The production matcher weights for a run: the committed asset when
    cfg.tryon.use_matcher (default true) and the asset exists, else None
    (procedural fallback). cfg=None behaves like the defaults."""
    if cfg is not None and not cfg.tryon.use_matcher:
        return None
    from fashion_nerf.tryon.matcher import load_matcher
    return load_matcher(cfg.tryon.matcher_asset if cfg is not None else "")


def build_conditioning(pair: dict, H: int, W: int, cfg=None):
    """pair (host numpy) → (H, W, 7) conditioning stack on device. The TPS
    warp inside uses the learned matcher when its committed weights exist
    (resolve_matcher) — VERDICT r3 #5."""
    out = _preprocess_device(
        jnp.asarray(pair["image"]), jnp.asarray(pair["cloth"]),
        jnp.asarray(pair["cloth_mask"]),
        jnp.asarray(pair["parse"]), jnp.asarray(pair["keypoints"]),
        H=H, W=W, matcher_params=resolve_matcher(cfg))
    return out["cond"]


def preprocess_cli(cfg, args) -> int:
    """`fashion-nerf preprocess` body: run the pipeline, save PNG outputs."""
    from fashion_nerf.data.viton import load_viton_pair, synth_viton_pair

    root = cfg.data.root
    if root and os.path.isdir(os.path.join(root, "image")):
        ids = sorted(os.path.splitext(f)[0]
                     for f in os.listdir(os.path.join(root, "image")))
        pairs = [(i, load_viton_pair(root, i)) for i in ids]
    else:
        pairs = [("synthetic", synth_viton_pair())]

    out_dir = os.path.join(cfg.out_dir, cfg.name, "preprocess")
    os.makedirs(out_dir, exist_ok=True)
    import imageio.v2 as imageio
    matcher_params = resolve_matcher(cfg)
    for pid, pair in pairs:
        H, W = pair["image"].shape[:2]
        out = _preprocess_device(
            jnp.asarray(pair["image"]), jnp.asarray(pair["cloth"]),
            jnp.asarray(pair["cloth_mask"]), jnp.asarray(pair["parse"]),
            jnp.asarray(pair["keypoints"]), H=H, W=W,
            matcher_params=matcher_params)
        wm = out["warped_mask"][..., None]
        out["tryon_overlay"] = (out["agnostic"] * (1.0 - wm)
                                + out["warped_cloth"] * wm)
        for name in ("agnostic", "warped_cloth", "tryon_overlay"):
            img = np.clip(np.asarray(out[name]), 0, 1)
            imageio.imwrite(os.path.join(out_dir, f"{pid}_{name}.png"),
                            (img * 255).astype(np.uint8))
        np.save(os.path.join(out_dir, f"{pid}_cond.npy"),
                np.asarray(out["cond"], np.float32))
    print(json.dumps({"pairs": len(pairs), "out": out_dir,
                      "matcher": matcher_params is not None}))
    return 0
