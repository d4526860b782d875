"""Hermetic loader tests (SURVEY.md §4.6): procedural micro-datasets written
to tmp dirs — blender transforms.json layout and LLFF poses_bounds.npy."""

import json
import os

import numpy as np
import pytest

from fashion_nerf.data.blender import load_blender
from fashion_nerf.data.llff import load_llff
from fashion_nerf.data.synthetic import _pose_spherical


def _write_png(path, img):
    import imageio.v2 as imageio
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


@pytest.fixture
def blender_dir(tmp_path):
    rng = np.random.default_rng(0)
    H = W = 8
    for split, n in (("train", 3), ("val", 1), ("test", 2)):
        frames = []
        os.makedirs(tmp_path / split, exist_ok=True)
        for i in range(n):
            pose = _pose_spherical(120.0 * i, -30.0, 4.0)
            pose4 = np.concatenate(
                [pose, np.array([[0, 0, 0, 1.0]], np.float32)], 0)
            img = rng.uniform(size=(H, W, 4))
            _write_png(tmp_path / split / f"r_{i}.png", img)
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": pose4.tolist()})
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(tmp_path)


def test_blender_loader(blender_dir):
    d = load_blender(blender_dir, white_bkgd=True)
    assert d["images"].shape == (3, 8, 8, 3)
    assert d["poses"].shape == (3, 3, 4)
    assert d["test_images"].shape == (2, 8, 8, 3)
    assert d["render_poses"].shape[1:] == (3, 4)
    # focal from fov: W/(2 tan(0.6911/2))
    assert d["focal"] == pytest.approx(8 / (2 * np.tan(0.6911 / 2)), rel=1e-5)
    assert d["images"].min() >= 0 and d["images"].max() <= 1


def test_blender_half_res(blender_dir):
    d = load_blender(blender_dir, half_res=True)
    assert d["images"].shape == (3, 4, 4, 3)
    assert d["H"] == 4 and d["W"] == 4


def test_blender_white_vs_black(blender_dir):
    dw = load_blender(blender_dir, white_bkgd=True)
    db = load_blender(blender_dir, white_bkgd=False)
    # alpha < 1 somewhere → white composite is brighter
    assert dw["images"].mean() > db["images"].mean()


@pytest.fixture
def llff_dir(tmp_path):
    rng = np.random.default_rng(1)
    H, W, focal = 12, 16, 20.0
    n = 6
    os.makedirs(tmp_path / "images", exist_ok=True)
    rows = []
    for i in range(n):
        img = rng.uniform(size=(H, W, 3))
        _write_png(tmp_path / "images" / f"{i:03d}.png", img)
        # forward-facing-ish cameras in LLFF [down, right, back] convention,
        # spread along x, looking down -z (world)
        c2w = np.zeros((3, 5), np.float32)
        # columns: [down, right, back, t, hwf]
        c2w[:, 0] = [0, -1, 0]          # down
        c2w[:, 1] = [1, 0, 0]           # right
        c2w[:, 2] = [0, 0, 1]           # back (camera looks -z)
        c2w[:, 3] = [0.1 * i, 0.02 * i, 0.0]
        c2w[:, 4] = [H, W, focal]
        rows.append(np.concatenate([c2w.reshape(-1), [2.0, 10.0]]))
    np.save(tmp_path / "poses_bounds.npy", np.stack(rows))
    return str(tmp_path)


def test_llff_loader(llff_dir):
    d = load_llff(llff_dir, factor=1, holdout=3)
    assert d["images"].shape[1:] == (12, 16, 3)
    assert d["poses"].shape[1:] == (3, 4)
    # holdout split: every 3rd image is test
    assert len(d["test_images"]) == 2 and len(d["images"]) == 4
    assert d["near"] == 0.0 and d["far"] == 1.0      # NDC bounds
    assert d["render_poses"].shape == (40, 3, 4)
    assert np.isfinite(d["render_poses"]).all()
    # rescaled bounds: nearest ≈ 1/bd_factor
    assert d["bounds"].min() == pytest.approx(1.0 / 0.75, rel=1e-5)


def test_llff_downsample(llff_dir):
    d = load_llff(llff_dir, factor=2, holdout=3)
    assert d["images"].shape[1:] == (6, 8, 3)


def test_blender_hermetic_fallback():
    """blender_lego must be CLI-drivable with no scene data: empty
    data.root falls back to the procedural lego-extent scene (r2)."""
    from fashion_nerf.config import load_config
    from fashion_nerf.train.loop import _load_dataset

    d = _load_dataset(load_config("blender_lego"))
    assert d["images"].shape[0] == 16
    assert d["H"] == d["W"] == 160
    assert d["val_image"].shape == (160, 160, 3)
    assert "val_pose" in d and "focal" in d


def test_llff_hermetic_fallback():
    from fashion_nerf.config import load_config
    from fashion_nerf.train.loop import _load_dataset

    d = _load_dataset(load_config("llff_fern"))
    assert d["near"] == 0.0 and d["far"] == 1.0      # NDC bounds
    assert d["images"].shape[0] == 12
