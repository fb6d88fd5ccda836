"""Checkpoint/resume — the tf.train.Saver + stage-switch equivalent
(DNNTraining.py:314-321, Config.pm.in:240-242, SURVEY.md §5).

Model/optimizer state goes through orbax with max_to_keep retention;
pipeline stages persist a tiny JSON manifest so a killed run resumes at
the first unfinished stage (the Training.pl stage-switch analogue).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


class Checkpointer:
    """Orbax-backed train-state checkpoints (max_to_keep, save_interval)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(
            jax.tree_util.tree_map(np.asarray, template)))


class StageManifest:
    """Idempotent stage tracking (the Config.pm stage switches)."""

    def __init__(self, workdir: str):
        self.path = os.path.join(workdir, "stages.json")
        os.makedirs(workdir, exist_ok=True)
        self._data = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    def done(self, stage: str) -> bool:
        return self._data.get(stage, {}).get("done", False)

    def mark(self, stage: str, **info) -> None:
        self._data[stage] = {"done": True, **info}
        with open(self.path, "w") as f:
            json.dump(self._data, f, indent=1)

    def reset_from(self, stage: str, order) -> None:
        """Invalidate `stage` and everything after it."""
        idx = order.index(stage)
        for s in order[idx:]:
            self._data.pop(s, None)
        with open(self.path, "w") as f:
            json.dump(self._data, f, indent=1)
