"""Checkpoint / resume via Orbax (SURVEY.md §5.4).

Saves the full TrainState (params, Adam moments, step, PRNG key) so resume
continues the identical trajectory. Keep-last-N retention; the training
driver calls save() on its ckpt cadence.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


# One manager per (directory, keep): Orbax saves run async off the step path
# (SURVEY.md §5.4); a throwaway manager per save would leak worker threads
# and crash at interpreter shutdown with saves still in flight. Readers get
# their own non-deleting manager so a restore() before the first save() can
# never install the wrong retention policy (ADVICE r1).
_MANAGERS: dict = {}
_READERS: dict = {}


def _mgr(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    """Writer manager: keep-last-N PLUS the single best-val-PSNR checkpoint.

    best_fn alone makes max_to_keep keep only the N BEST checkpoints — a
    val-PSNR dip would delete the just-saved latest one and resume would
    silently rewind. The composite preservation policy keeps the latest N
    AND the best-metric one (union), which is the §5.4 contract."""
    from orbax.checkpoint.checkpoint_managers import preservation_policy as pp
    directory = os.path.abspath(directory)
    cache_key = (directory, keep)
    if cache_key not in _MANAGERS:
        policy = pp.AnyPreservationPolicy([
            pp.LatestN(n=keep),
            pp.BestN(get_metric_fn=lambda m: m.get("val_psnr", -1.0),
                     n=1,
                     # metric-less saves are LatestN's job; letting BestN
                     # also keep them would disable pruning entirely
                     keep_checkpoints_without_metrics=False),
        ])
        _MANAGERS[cache_key] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                create=True, preservation_policy=policy),
        )
    return _MANAGERS[cache_key]


def _reader(directory: str) -> ocp.CheckpointManager:
    """Read-only manager: preserves everything, creates nothing."""
    from orbax.checkpoint.checkpoint_managers import preservation_policy as pp
    directory = os.path.abspath(directory)
    if directory not in _READERS:
        _READERS[directory] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                create=False, preservation_policy=pp.PreserveAll()),
        )
    return _READERS[directory]


def finalize():
    """Block until all in-flight async saves land (call at end of training)."""
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()
    _reload_readers()


def _reload_readers():
    # readers cache the step list at construction; drop them so a restore
    # after new saves sees the new steps
    _READERS.clear()


def save(directory: str, state, keep: int = 3, wait: bool = False,
         metrics: dict | None = None):
    """Save TrainState at its current step (async off the step path).

    metrics (e.g. {"val_psnr": 31.2}) drive best-checkpoint retention."""
    mgr = _mgr(directory, keep)
    step = int(jax.device_get(state.step))
    mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
    if wait:
        mgr.wait_until_finished()
    return step


def restore(directory: str, template_state, step: int | None = None):
    """Restore the latest (or a specific) checkpoint into the structure of
    `template_state` (a freshly-created TrainState with matching shapes)."""
    if not os.path.isdir(directory):
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    # prefer the writer manager when one exists for this dir (it sees steps
    # saved this process, including in-flight async ones)
    mgr = next((m for (d, _), m in _MANAGERS.items()
                if d == os.path.abspath(directory)), None) or \
        _reader(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    return mgr.restore(step, args=ocp.args.StandardRestore(template_state))


def latest_step(directory: str):
    if not os.path.isdir(directory):
        return None
    mgr = next((m for (d, _), m in _MANAGERS.items()
                if d == os.path.abspath(directory)), None) or \
        _reader(directory)
    return mgr.latest_step()
