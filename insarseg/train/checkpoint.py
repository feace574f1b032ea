"""Orbax checkpointing: best-by-mIoU params AND latest-with-optimizer-state.

The reference only ever saves ``model.state_dict()`` on val-mIoU improvement
(/root/reference/Unet.py:304-309) and never loads it back — no resume, no
optimizer state (SURVEY.md §5). Here:

- ``save_best``  — params + batch_stats (inference checkpoint), like the
  reference's best.pth but restorable.
- ``save_latest`` — full TrainState (params, batch_stats, opt_state, step)
  for crash-resume.
- ``restore_latest`` / ``restore_best`` — typed restore via an abstract tree.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- paths --
    @property
    def best_path(self) -> str:
        return os.path.join(self.directory, "best")

    @property
    def latest_path(self) -> str:
        return os.path.join(self.directory, "latest")

    # -- save --
    def save_best(self, state, miou: float) -> None:
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "miou": jax.numpy.asarray(miou),
        }
        self._ckptr.save(self.best_path, tree, force=True)
        self._ckptr.wait_until_finished()
        # tiny sidecar so resume can continue best-mIoU tracking without
        # restoring the whole tree
        with open(os.path.join(self.directory, "best_miou.json"), "w") as f:
            json.dump({"miou": float(miou)}, f)

    def best_metric(self) -> float:
        """Best val-mIoU recorded so far, or -1.0 if none (used by resume)."""
        p = os.path.join(self.directory, "best_miou.json")
        if os.path.exists(p):
            with open(p) as f:
                return float(json.load(f)["miou"])
        return -1.0

    def save_latest(self, state) -> None:
        tree = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._ckptr.save(self.latest_path, tree, force=True)
        self._ckptr.wait_until_finished()

    # -- restore --
    def restore_best(self, abstract_tree: Optional[Any] = None):
        return self._ckptr.restore(self.best_path, abstract_tree)

    def restore_latest(self, state):
        """Restore into the structure of an existing (freshly-created)
        TrainState; returns the updated state."""
        abstract = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._ckptr.restore(
            self.latest_path, jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract)
        )
        return state.replace(**restored)

    def has_latest(self) -> bool:
        return os.path.isdir(self.latest_path)
