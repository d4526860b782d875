"""LLFF forward-facing loader — BASELINE.json:9.

Canonical layout [EXT]: poses_bounds.npy of shape (N, 17): per image a 3×5
matrix (rotation | translation | [H, W, focal] column) in [down, right, back]
convention plus [near, far] bounds; images in images/ or pre-downsampled
images_{factor}/. Pose recentering, spiral render path, NDC-ready near/far.
Reference@v1 ships no loader (/root/reference/README.md:1-2).
"""

from __future__ import annotations

import os

import numpy as np


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32) / 255.0


def _box_down(img: np.ndarray, factor: int) -> np.ndarray:
    H, W = img.shape[:2]
    H2, W2 = H // factor, W // factor
    img = img[:H2 * factor, :W2 * factor]
    img = img.reshape(H2, factor, W2, factor, -1).mean(axis=(1, 3))
    return img.astype(np.float32)


def _normalize(v):
    return v / np.linalg.norm(v)


def _viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def _poses_avg(poses):
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return _viewmatrix(vec2, up, center)


def recenter_poses(poses):
    """Rigidly transform all poses so their average is the identity."""
    c2w = _poses_avg(poses)
    bottom = np.array([[0, 0, 0, 1.0]], np.float32)
    c2w_h = np.concatenate([c2w, bottom], 0)
    poses_h = np.concatenate(
        [poses[:, :3, :4], np.tile(bottom[None], (len(poses), 1, 1))], 1)
    out = np.linalg.inv(c2w_h) @ poses_h
    return out[:, :3, :4].astype(np.float32)


def spiral_path(poses, bounds, n_views: int = 120, n_rots: int = 2,
                zrate: float = 0.5):
    """Standard LLFF spiral render path around the average pose."""
    c2w = _poses_avg(poses)
    up = _normalize(poses[:, :3, 1].sum(0))
    close_depth, inf_depth = bounds.min() * 0.9, bounds.max() * 5.0
    dt = 0.75
    focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    rads = np.percentile(np.abs(poses[:, :3, 3] - c2w[:3, 3]), 90, axis=0)
    rads = np.concatenate([rads, [1.0]])
    out = []
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_views,
                             endpoint=False):
        c = c2w[:3, :4] @ (np.array([np.cos(theta), -np.sin(theta),
                                     -np.sin(theta * zrate), 1.0]) * rads)
        z = _normalize(c - c2w[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        out.append(_viewmatrix(z, up, c).astype(np.float32))
    return np.stack(out)


def load_llff(root: str, factor: int = 8, recenter: bool = True,
              bd_factor: float = 0.75, spherify: bool = False,
              holdout: int = 8):
    """→ dataset dict (see blender.load_blender) with NDC-ready bounds."""
    pb = np.load(os.path.join(root, "poses_bounds.npy"))       # (N, 17)
    poses = pb[:, :-2].reshape(-1, 3, 5)                        # (N, 3, 5)
    bounds = pb[:, -2:]                                         # (N, 2)

    img_dir = os.path.join(root, f"images_{factor}" if factor > 1
                           else "images")
    need_down = 1
    if not os.path.isdir(img_dir):
        img_dir = os.path.join(root, "images")
        need_down = factor
    files = sorted(f for f in os.listdir(img_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    imgs = []
    for f in files:
        img = _imread(os.path.join(img_dir, f))[..., :3]
        if need_down > 1:
            img = _box_down(img, need_down)
        imgs.append(img)
    images = np.stack(imgs)
    assert len(images) == len(poses), (len(images), len(poses))

    H, W = images.shape[1:3]
    hwf = poses[:, :, 4]                  # original (H, W, focal)
    focal = float(hwf[0, 2]) * H / hwf[0, 0]

    # [down, right, back] → [right, up, back] (the canonical LLFF fixup)
    poses = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:4]], axis=2)

    # rescale so the nearest bound sits at ~1 (matched NDC conditioning)
    scale = 1.0 / (bounds.min() * bd_factor)
    poses[:, :3, 3] *= scale
    bounds = bounds * scale

    if recenter:
        poses = recenter_poses(poses)

    render_poses = spiral_path(poses, bounds, n_views=40)

    i_test = np.arange(len(images))[::holdout]
    i_train = np.array([i for i in range(len(images)) if i not in i_test])

    return {
        "images": images[i_train],
        "poses": poses[i_train, :3, :4].astype(np.float32),
        "focal": focal,
        "val_image": images[i_test[0]],
        "val_pose": poses[i_test[0], :3, :4].astype(np.float32),
        "test_images": images[i_test],
        "test_poses": poses[i_test, :3, :4].astype(np.float32),
        "render_poses": render_poses,
        "H": H, "W": W,
        # NDC parameterization: sample t ∈ [0, 1] (cameras.ndc_rays)
        "near": 0.0, "far": 1.0,
        "bounds": bounds,
    }
