"""Checkpoint / resume via Orbax.

Successor to the TF ``Saver`` flow (``/root/reference/train.py:175,189-206,
242-244``): sharded, async-capable checkpoints with the same two restore
modes —

- **resume** (``--load_path``): restore everything including ``step``;
  Noam warmup stays the short 4k "randomly initialized" schedule.
- **initialize** (``--initialize_path``): warm-start the weights but reset
  ``step`` to 0; the run is treated as *not* randomly initialized, which
  selects the long 40k warmup (``models/tacotron.py:316-320``).

The run directory also snapshots the config JSON (the reference copies
``hparams.py`` + writes ``params.json``, ``utils/__init__.py:39-61,100-107``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config, load_config, save_config
from .state import TrainState

CONFIG_FILENAME = "config.json"


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager bound to a run directory."""

    def __init__(self, run_dir: str, config: Config,
                 max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self.config = config
        cfg_path = os.path.join(self.run_dir, CONFIG_FILENAME)
        if not os.path.exists(cfg_path):
            save_config(config, cfg_path)
        keep = max_to_keep or config.train.max_checkpoints_to_keep
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.run_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=async_save),
        )

    # ------------------------------------------------------------------ save

    def save(self, state: TrainState) -> None:
        """Persist ``state`` (async by default).

        With ``async_save`` the call blocks only for the device->host copy
        (Orbax's async contract); serialization to disk continues on a
        background thread, so the train loop does not stall on storage.
        The copy-before-return also makes it safe for the caller to feed
        ``state`` straight back into a ``donate_argnums`` step function.
        ``restore``/``latest_step``/``close`` barrier on pending writes.
        """
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        """Block until all pending async saves are durable on disk."""
        self._mgr.wait_until_finished()

    # --------------------------------------------------------------- restore

    @property
    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Resume mode: full state including step."""
        self._mgr.wait_until_finished()
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.run_dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        # ocp.CheckpointManager.close() waits for pending async saves
        self._mgr.close()


def load_run_config(run_dir: str) -> Config:
    """Re-apply the config a run was trained with
    (reference ``utils/__init__.py:110-126``)."""
    return load_config(os.path.join(run_dir, CONFIG_FILENAME))


def warm_start(template: TrainState, source_run_dir: str,
               source_config: Optional[Config] = None) -> TrainState:
    """Initialize mode: take params/batch_stats from ``source_run_dir``'s
    newest checkpoint, reset step to 0 and optimizer state to fresh.

    Returns a TrainState whose ``opt_state`` is the *template's* (fresh)
    optimizer state, matching the reference's behavior of restoring variables
    then zeroing ``global_step`` (``train.py:197-205``).
    """
    cfg = source_config or load_run_config(source_run_dir)
    src = CheckpointManager(source_run_dir, cfg)
    try:
        restored = src.restore(template)
    finally:
        src.close()
    return TrainState(
        step=jax.numpy.zeros((), restored.step.dtype),
        params=restored.params,
        batch_stats=restored.batch_stats,
        opt_state=template.opt_state,
    )
