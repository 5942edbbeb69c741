"""Training checkpoints: orbax for sharded state, safetensors for portability.

Replaces mmengine CheckpointHook (every 5000 iters, keep 2, no optimizer
state — configs/gar_1b.py:178-184) and xtuner guess_load_checkpoint. Unlike
the reference we CAN save optimizer state (orbax shards it across hosts);
`save_optimizer=False` reproduces the reference's slim checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        *,
        save_interval: int = 5000,
        max_to_keep: int = 2,
        save_optimizer: bool = True,
    ):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        self.save_optimizer = save_optimizer
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval,
                max_to_keep=max_to_keep,
            ),
        )
        # steps saved BY THIS PROCESS, tracked in Python: with async orbax a
        # cadence save may not yet be finalized (and thus absent from
        # all_steps()) when the end-of-run force save queries it — the
        # all_steps() dedupe alone would re-save (delete + rewrite) the step,
        # racing the in-flight write on some orbax versions
        self._saved_steps: set = set()

    def maybe_save(self, step: int, state, force: bool = False) -> bool:
        ocp = _ocp()
        if force and (step in self._saved_steps or step in self.mgr.all_steps()):
            return False  # the cadence already saved this exact step
        if not force and not self.mgr.should_save(step):
            return False  # skip building the payload off-cadence
        payload = state._asdict() if hasattr(state, "_asdict") else dict(state)
        if not self.save_optimizer:
            payload = {k: v for k, v in payload.items() if k != "opt_state"}
        saved = self.mgr.save(
            step, args=ocp.args.StandardSave(payload), force=force
        )
        if saved:
            self._saved_steps.add(step)
        return saved

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        ocp = _ocp()
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        template = (
            state_template._asdict()
            if hasattr(state_template, "_asdict")
            else dict(state_template)
        )
        if not self.save_optimizer:
            template = {k: v for k, v in template.items() if k != "opt_state"}
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        if hasattr(state_template, "_replace"):
            return state_template._replace(**restored)
        return restored

    def wait(self):
        self.mgr.wait_until_finished()
