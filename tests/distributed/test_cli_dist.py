"""CLI → mesh wiring (VERDICT r1 #4): `fashion-nerf train --set dist.dp=8`
must actually build the mesh and shard the run — not silently train on one
chip. Runs on the 8-virtual-CPU-device mesh (tests/conftest.py)."""

import json

import jax
import pytest

from fashion_nerf.config import load_config
from fashion_nerf.dist.mesh import resolve_mesh

_TINY = ["model.net_depth=2", "model.net_width=16", "model.posenc_xyz=2",
         "model.posenc_dir=2", "sampling.n_coarse=8",
         "train.batch_rays=32", "train.iters=2", "train.log_every=1",
         "train.eval_every=1000", "train.ckpt_every=1000",
         "train.precrop_iters=0"]


def test_resolve_mesh_dp8_uses_virtual_cpu_devices():
    cfg = load_config("tiny_lego", _TINY + ["dist.dp=8"])
    mesh = resolve_mesh(cfg.dist)
    assert mesh is not None
    assert dict(mesh.shape) == {"dp": 8, "tp": 1}
    assert all(d.platform == "cpu" for d in mesh.devices.flat)


def test_resolve_mesh_single_device_is_none():
    # dp=-1 (default) on a platform with one device → no mesh, single-chip
    # path: build from an explicit 1-device view by pinning dp=1
    cfg = load_config("tiny_lego", ["dist.dp=1", "dist.tp=1"])
    assert resolve_mesh(cfg.dist) is None


def test_cli_train_dist_dp8_shards(tmp_path, monkeypatch, capsys):
    """End-to-end: the train subcommand builds an 8-way mesh, passes it into
    train(), and the sharded run completes with finite loss."""
    import fashion_nerf.cli as cli
    import fashion_nerf.train.loop as loop

    seen = {}
    real_train = loop.train

    def spy(cfg, *a, **kw):
        seen["mesh"] = kw.get("mesh")
        return real_train(cfg, *a, **kw)

    monkeypatch.setattr(loop, "train", spy)
    overrides = []
    for o in _TINY + ["dist.dp=8"]:
        overrides += ["--set", o]
    rc = cli.main(["train", "--config", "tiny_lego", *overrides,
                   "--out", str(tmp_path)])
    assert rc == 0
    mesh = seen["mesh"]
    assert mesh is not None and dict(mesh.shape) == {"dp": 8, "tp": 1}
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert final["done"] is True and final["steps"] == 2
    assert all(jax.numpy.isfinite(v).item() if hasattr(v, "item") else True
               for v in (final["final"] or {}).values()
               if isinstance(v, float))


def test_cli_train_dist_dp4_tp2(tmp_path):
    import fashion_nerf.cli as cli
    overrides = []
    for o in _TINY + ["dist.dp=4", "dist.tp=2"]:
        overrides += ["--set", o]
    rc = cli.main(["train", "--config", "tiny_lego", *overrides,
                   "--out", str(tmp_path)])
    assert rc == 0
