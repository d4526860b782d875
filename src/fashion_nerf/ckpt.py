"""Checkpoint / resume via Orbax (SURVEY.md §5.4).

Saves the full TrainState (params, Adam moments, step, PRNG key) so resume
continues the identical trajectory. Keep-last-N retention; the training
driver calls save() on its ckpt cadence.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


# One manager per directory: Orbax saves run async off the step path
# (SURVEY.md §5.4); a throwaway manager per save would leak worker threads
# and crash at interpreter shutdown with saves still in flight.
_MANAGERS: dict = {}


def _mgr(directory: str, keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    if directory not in _MANAGERS:
        _MANAGERS[directory] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                create=True,
                # keep-last-N PLUS retain the best-val-PSNR checkpoint
                # (SURVEY.md §5.4); saves without metrics are unaffected
                best_fn=lambda m: m.get("val_psnr", -1.0),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
            ),
        )
    return _MANAGERS[directory]


def finalize():
    """Block until all in-flight async saves land (call at end of training)."""
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


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
    mgr = _mgr(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    return mgr.restore(step, args=ocp.args.StandardRestore(template_state))


def latest_step(directory: str):
    if not os.path.isdir(directory):
        return None
    return _mgr(directory).latest_step()
