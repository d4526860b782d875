"""L6 — device mesh + sharding rules (SURVEY.md §2.4, §5.8).

TPU-native distribution: a 2-D Mesh ("dp", "tp"); the ray batch shards over
"dp" (rays are embarrassingly parallel — the natural NeRF axis), MLP hidden
dims optionally shard over "tp". XLA inserts the gradient psum over ICI from
the sharding annotations — no hand-written collectives (the comm backend IS
the XLA runtime; there is no NCCL analog to port, reference@v1 ships no
native code at all: /root/reference/README.md:1-2).

PP is documented N/A (an 8×256 MLP fits one core's VMEM thousands of times
over); the SP/CP analog (samples-per-ray scan decomposition) is implemented
in dist/segmented.py (segmented_ray_scan) and unnecessary at ≤192 samples;
EP is N/A (no MoE in the capability surface).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(multihost: bool = False):
    """Multi-host bring-up over DCN (SURVEY.md §3.5). Single-host is a no-op.

    The multi-process path is EXECUTED (not just wired) by
    tests/distributed/test_multihost.py: two coordinated CPU processes, one
    dp=8 mesh spanning both, XLA collectives across the process boundary,
    loss parity vs the same mesh in one process."""
    if multihost:
        jax.distributed.initialize()


def make_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "tp") mesh. dp=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // tp
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def resolve_mesh(dcfg) -> Mesh | None:
    """Production mesh from a DistConfig (cli.py calls this for every
    subcommand): dp=-1 fills all visible devices; a 1×1 mesh returns None
    (single-chip paths skip shard_map entirely). When the request exceeds
    the default platform's device count, fall back to the "cpu" platform —
    under the axon plugin jax.devices() hides the virtual host devices that
    XLA_FLAGS=--xla_force_host_platform_device_count creates (the CLI-level
    distributed tests run on that virtual mesh)."""
    devices = list(jax.devices())
    tp = dcfg.tp
    dp = dcfg.dp if dcfg.dp != -1 else max(len(devices) // tp, 1)
    n = dp * tp
    if n > len(devices):
        try:
            cpus = list(jax.devices("cpu"))
        except RuntimeError:
            cpus = []
        if len(cpus) >= n:
            devices = cpus
        else:
            raise ValueError(
                f"dist config dp={dp} tp={tp} needs {n} devices; "
                f"have {len(devices)} ({len(cpus)} cpu)")
    if n <= 1:
        return None
    return make_mesh(dp=dp, tp=tp, devices=devices)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the ray batch) over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_rule(mesh: Mesh):
    """Sharding rule keyed on param-tree paths.

    tp=1 → everything replicated. tp>1 → Megatron-style MLP sharding on the
    trunk: Dense kernels (in, out) shard the OUTPUT features over "tp"
    (column-parallel); biases likewise. GSPMD propagates activation shardings
    and inserts the reduce/all-gather collectives. Heads stay replicated
    (they are tiny). The same rule applies to Adam moments — their pytree
    paths mirror the param paths.
    """
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        if tp == 1 or getattr(leaf, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        names = [str(getattr(p, "key", getattr(p, "name", p)))
                 for p in path]
        in_trunk = any(n.startswith(("trunk_", "feature", "view_"))
                       for n in names)
        is_kernel = "kernel" in names
        is_bias = "bias" in names
        if in_trunk and is_kernel and leaf.ndim == 2 \
                and leaf.shape[1] % tp == 0:
            return NamedSharding(mesh, P(None, "tp"))
        if in_trunk and is_bias and leaf.ndim == 1 \
                and leaf.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp"))
        return NamedSharding(mesh, P())

    return rule


def param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(_tp_rule(mesh), params)


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params AND Adam moments per the tp
    rule (their paths mirror each other), scalars replicated."""
    rule = _tp_rule(mesh)
    return state.replace(
        params=jax.device_put(
            state.params,
            jax.tree_util.tree_map_with_path(rule, state.params)),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree_util.tree_map_with_path(rule, state.opt_state)),
        step=jax.device_put(state.step, replicated(mesh)),
        key=jax.device_put(state.key, replicated(mesh)),
    )


# SURVEY.md §2.3 inventory name
shard_rays = ray_sharding
