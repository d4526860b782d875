"""Two-process distributed smoke test on CPU (VERDICT r3 missing #4).

dist/mesh.py's multi-host story was init-only wiring until r4; this test
actually EXECUTES a 2-process jax.distributed run: the coordination
service, a dp=8 mesh spanning both processes' local devices, and XLA CPU
collectives carrying the gradient psum across the process boundary — then
parity-checks the losses against the same mesh shape in one process.

The subprocesses run WITHOUT the axon TPU site (PYTHONPATH is rebuilt with
src only) so JAX_PLATFORMS=cpu is honored — under the axon plugin it is
ignored (CLAUDE.md), and two processes must not share the TPU tunnel.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_WORKER = os.path.join(_REPO, "tests", "distributed", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp8_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.join(_REPO, "src")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    line = [ln for ln in outs[0][0].splitlines()
            if ln.startswith("{")][-1]
    got = json.loads(line)
    assert got["devices"] == 8

    # single-process reference on this process's 8 virtual CPU devices,
    # identical mesh shape and problem (the dp test's fixture inline)
    import jax
    from fashion_nerf.config import load_config
    from fashion_nerf.data.pipeline import RayDataset
    from fashion_nerf.data.synthetic import make_synthetic_scene
    from fashion_nerf.dist.mesh import make_mesh, shard_state
    from fashion_nerf.train.loop import make_train_step
    from fashion_nerf.train.state import create_train_state
    from jax.sharding import NamedSharding, PartitionSpec as P

    ovr = ["model.net_depth=2", "model.net_width=32", "model.posenc_xyz=4",
           "model.posenc_dir=2", "sampling.n_coarse=8", "sampling.n_fine=8",
           "train.batch_rays=64", "train.precrop_iters=0",
           "kernels.use_pallas=false"]
    cfg = load_config("blender_lego", ovr)
    scene = make_synthetic_scene(n_views=2, H=8, W=8, n_samples=8)
    ds = RayDataset(scene["images"], scene["poses"], scene["focal"])
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual cpu devices")
    mesh = make_mesh(dp=8, tp=1, devices=devs[:8])
    state = shard_state(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
    all_rays = jax.device_put(ds.batch_arrays(), NamedSharding(mesh, P()))
    step_fn = make_train_step(cfg, ds, mesh=mesh)
    ref = []
    for _ in range(3):
        state, m = step_fn(state, all_rays)
        ref.append(float(m["loss"]))

    np.testing.assert_allclose(got["losses"], ref, rtol=5e-3, atol=1e-4)
