"""NeRF-synthetic (Blender) loader — BASELINE.json:8.

Canonical layout [EXT]: transforms_{train,val,test}.json with
`camera_angle_x` and per-frame `transform_matrix` (4×4 c2w), RGBA PNGs at
800×800. Alpha composites onto white (or black), focal = W/(2·tan(fov/2)).
Reference@v1 ships no loader (/root/reference/README.md:1-2).
"""

from __future__ import annotations

import json
import os

import numpy as np


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    return img


def load_blender(root: str, half_res: bool = False, white_bkgd: bool = True,
                 splits=("train", "val", "test")):
    """→ dict(images, poses, focal, val_image, val_pose, test_images,
    test_poses, render_poses, H, W, near, far)."""
    metas = {}
    for s in splits:
        with open(os.path.join(root, f"transforms_{s}.json")) as f:
            metas[s] = json.load(f)

    all_imgs, all_poses = {}, {}
    for s in splits:
        imgs, poses = [], []
        for frame in metas[s]["frames"]:
            fp = os.path.join(root, frame["file_path"] + ".png")
            img = _imread(fp)
            imgs.append(img)
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
        all_imgs[s] = np.stack(imgs) if imgs else np.zeros((0, 1, 1, 4))
        all_poses[s] = (np.stack(poses) if poses
                        else np.zeros((0, 4, 4), np.float32))

    H, W = all_imgs["train"].shape[1:3]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    def composite(imgs):
        if imgs.shape[-1] == 4:
            rgb, a = imgs[..., :3], imgs[..., 3:]
            if white_bkgd:
                return rgb * a + (1.0 - a)
            return rgb * a
        return imgs

    def maybe_half(imgs, H, W, focal):
        if not half_res:
            return imgs, H, W, focal
        H2, W2 = H // 2, W // 2
        # 2×2 box-filter downsample (no cv2 dependency)
        out = imgs[:, :H2 * 2, :W2 * 2]
        out = 0.25 * (out[:, 0::2, 0::2] + out[:, 1::2, 0::2]
                      + out[:, 0::2, 1::2] + out[:, 1::2, 1::2])
        return out.astype(np.float32), H2, W2, focal * 0.5

    train = composite(all_imgs["train"])
    train, H2, W2, focal2 = maybe_half(train, H, W, focal)
    val = composite(all_imgs.get("val", all_imgs["train"][:1]))
    val, _, _, _ = maybe_half(val, H, W, focal)
    test = composite(all_imgs.get("test", all_imgs["train"][:1]))
    test, _, _, _ = maybe_half(test, H, W, focal)

    from fashion_nerf.data.synthetic import _pose_spherical
    render_poses = np.stack(
        [_pose_spherical(a, -30.0, 4.0)
         for a in np.linspace(-180, 180, 40, endpoint=False)])

    return {
        "images": train.astype(np.float32),
        "poses": all_poses["train"][:, :3, :4],
        "focal": float(focal2),
        "val_image": val[0] if len(val) else train[0],
        "val_pose": (all_poses.get("val", all_poses["train"])[0][:3, :4]),
        "test_images": test.astype(np.float32),
        "test_poses": all_poses.get("test", all_poses["train"])[:, :3, :4],
        "render_poses": render_poses,
        "H": H2, "W": W2, "near": 2.0, "far": 6.0,
    }
