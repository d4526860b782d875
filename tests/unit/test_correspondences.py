"""Keypoint-conditioned TPS correspondences (tryon/pipeline.py, VERDICT r1
#10): the silhouette-grid warp must beat the bbox→torso-line stand-in on the
procedural pair, measured as warped-cloth-mask IoU with the garment parse
region — the done-gate the round-1 judge set."""

import jax.numpy as jnp
import numpy as np

from fashion_nerf.data.viton import synth_viton_pair
from fashion_nerf.tryon.pipeline import (garment_control_points,
                                         keypoint_grid_correspondences,
                                         torso_targets)
from fashion_nerf.tryon.segmentation import parse_to_masks
from fashion_nerf.tryon.tps import fit_tps, grid_sample, tps_grid


def _warp_iou(src, dst, cloth_mask, garment_mask, H, W):
    tps = fit_tps(dst, src)                      # backward map
    grid = tps_grid(tps, H, W)
    warped = grid_sample(cloth_mask[..., None], grid)[..., 0]
    w = warped > 0.5
    g = np.asarray(garment_mask) > 0.5
    inter = np.logical_and(w, g).sum()
    union = np.logical_or(w, g).sum()
    return inter / max(union, 1)


def _setup():
    pair = synth_viton_pair(H=64, W=64)
    H, W = pair["cloth_mask"].shape
    masks = parse_to_masks(jnp.asarray(pair["parse"]))
    return pair, masks, H, W


def test_iou_improves_over_bbox_baseline():
    pair, masks, H, W = _setup()
    cloth_mask = jnp.asarray(pair["cloth_mask"])
    kp = jnp.asarray(pair["keypoints"])

    src_old = garment_control_points(cloth_mask)
    dst_old = torso_targets(kp, H, W)
    iou_old = _warp_iou(src_old, dst_old, cloth_mask, masks["garment"], H, W)

    src_new, dst_new = keypoint_grid_correspondences(
        cloth_mask, masks["garment"], kp, H, W)
    iou_new = _warp_iou(src_new, dst_new, cloth_mask, masks["garment"], H, W)

    assert iou_new > iou_old, (iou_new, iou_old)
    assert iou_new > 0.6, iou_new


def test_correspondences_shapes_and_range():
    pair, masks, H, W = _setup()
    src, dst = keypoint_grid_correspondences(
        jnp.asarray(pair["cloth_mask"]), masks["garment"],
        jnp.asarray(pair["keypoints"]), H, W, k_rows=6)
    assert src.shape == dst.shape == (18, 2)
    for p in (src, dst):
        a = np.asarray(p)
        assert np.isfinite(a).all()
        assert (a >= -1.001).all() and (a <= 1.001).all()


def test_robust_to_missing_keypoints_and_empty_masks():
    pair, masks, H, W = _setup()
    no_kp = jnp.zeros_like(jnp.asarray(pair["keypoints"]))
    src, dst = keypoint_grid_correspondences(
        jnp.asarray(pair["cloth_mask"]), masks["garment"], no_kp, H, W)
    assert np.isfinite(np.asarray(src)).all()
    assert np.isfinite(np.asarray(dst)).all()
    # fully-empty masks must still yield a finite, solvable system
    empty = jnp.zeros((H, W))
    src, dst = keypoint_grid_correspondences(empty, empty, no_kp, H, W)
    tps = fit_tps(dst, src)
    grid = tps_grid(tps, H, W)
    assert np.isfinite(np.asarray(grid)).all()
