"""Parity harness (parity.py): anchor resolution, gate math, and the scene
sweep — hermetic (injected eval fn, fabricated scene dirs), per SURVEY.md §4.
The anchors are external ([EXT] Mildenhall 2020 T4); the reference publishes
none (README.md:1-2)."""

import json
import os

from fashion_nerf.config import load_config
from fashion_nerf.parity import (anchor_for, anchor_row, run_parity,
                                 scene_dirs)


def test_anchor_lookup_by_basename():
    assert anchor_for("/data/nerf_synthetic/lego", "blender") == 32.54
    assert anchor_for("/data/nerf_synthetic/lego/", "blender") == 32.54
    assert anchor_for("/data/llff/fern", "llff") == 25.17
    assert anchor_for("/data/llff/unknown_scene", "llff") is None
    assert anchor_for("/data/x/lego", "tiny") is None


def test_anchor_row_gate():
    row = anchor_row("/d/lego", "blender", psnr=32.50)
    assert row["parity"] is True          # -0.04 dB within the 0.1 gate
    row = anchor_row("/d/lego", "blender", psnr=32.30)
    assert row["parity"] is False         # -0.24 dB fails
    row = anchor_row("/d/lego", "blender", psnr=33.00)
    assert row["parity"] is True          # beating the anchor passes
    assert anchor_row("/d/nope", "blender", psnr=30.0)["anchor_psnr"] is None


def test_scene_dirs_discovery(tmp_path):
    for scene in ("lego", "ship", "not_a_scene"):
        d = tmp_path / scene
        d.mkdir()
        if scene != "not_a_scene":
            (d / "transforms_train.json").write_text("{}")
    found = scene_dirs(str(tmp_path), "blender")
    assert [os.path.basename(f) for f in found] == ["lego", "ship"]
    # a root that IS a single scene yields itself
    assert scene_dirs(str(tmp_path / "lego"), "blender") == [
        str(tmp_path / "lego")]
    assert scene_dirs(str(tmp_path), "llff") == []


def test_fetch_and_parity_script_layout(tmp_path):
    """The documented one-command path (scripts/fetch_and_parity.sh,
    VERDICT r2 #7) iterates exactly the scene layout scene_dirs() accepts:
    <root>/<scene>/transforms_train.json (blender) or poses_bounds.npy
    (llff). Dry-run the shell script's discovery loop against a synthetic
    root and check it selects the same directories."""
    import subprocess
    root = tmp_path / "nerf_synthetic"
    for scene in ("lego", "ship"):
        d = root / scene
        d.mkdir(parents=True)
        (d / "transforms_train.json").write_text("{}")
    (root / "notes").mkdir()       # non-scene dir must be skipped
    script = os.path.join(os.path.dirname(__file__), "..", "..",
                          "scripts", "fetch_and_parity.sh")
    assert os.path.exists(script)
    # extract the discovery loop's behavior: list dirs the script would
    # train (marker check mirrors scene_dirs)
    found = [os.path.basename(os.path.normpath(d))
             for d in scene_dirs(str(root), "blender")]
    sh = subprocess.run(
        ["bash", "-c",
         'for d in "$1"/*/; do [ -f "$d/transforms_train.json" ] '
         '&& basename "$d"; done; true', "_", str(root)],
        capture_output=True, text=True)
    assert sh.stdout.split() == found == ["lego", "ship"]


def test_run_parity_sweep(tmp_path, capsys):
    for scene, _ in (("lego", 32.60), ("ship", 28.00)):
        d = tmp_path / scene
        d.mkdir()
        (d / "transforms_train.json").write_text("{}")
    cfg = load_config("blender_lego", [
        f"data.root={tmp_path}", "data.dataset=blender"])
    fake_scores = {"lego": (32.60, 0.96), "ship": (28.00, 0.87)}

    def eval_scene(scene_cfg):
        return fake_scores[os.path.basename(scene_cfg.data.root)]

    rows = run_parity(cfg, eval_scene)
    assert len(rows) == 2
    by_scene = {r["scene"]: r for r in rows}
    assert by_scene["lego"]["parity"] is True      # +0.06 vs 32.54
    assert by_scene["ship"]["parity"] is False     # -0.65 vs 28.65
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    summary = lines[-1]
    assert summary["scenes"] == 2 and summary["parity_pass"] == 1
