"""Orbax checkpointing with latest-by-step resume semantics.

The reference saves only ``model.state_dict()`` every ``save_every`` epochs
and resumes from the latest ``model_<epoch>.pt`` (trainer.py:38-52, 85-90) —
losing optimizer/scheduler/RNG state, and never advancing its resume epoch
counter. Here the full training state (params, batch_stats, opt_state, LR
scheduler, RNG key, epoch) is checkpointed, and resume continues the epoch
numbering (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
        )

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Tuple[Optional[int], Any]:
        """Restore the latest checkpoint into the shape/dtype of ``template``
        (a concrete pytree, e.g. a freshly initialised train state).
        Returns (step, tree) or (None, template) when nothing is saved."""
        step = self._mgr.latest_step()
        if step is None:
            return None, template
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        tree = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return step, tree

    def delete(self, step: int) -> None:
        """Remove a saved step — used by the elastic restart path to discard
        a checkpoint whose restored state fails the finiteness health check
        (e.g. written by a crashed/preempted process mid-divergence)."""
        self._mgr.delete(step)

    def close(self):
        self._mgr.close()
