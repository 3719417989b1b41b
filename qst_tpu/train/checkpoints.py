"""Orbax checkpointing: periodic + best-model, with total-limit retention.

Capability match for the reference's delegation to ``SentenceTransformer.fit``
(checkpoint every ``checkpoint_save_steps`` with
``checkpoint_save_total_limit``, plus ``save_best_model`` keyed on the main
evaluator score — reference training/main.py:139-147,231-236), extended with
what the reference never exposed: full optimizer-state + step resume
(SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from qst_tpu.train.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, save_steps: int = 500,
                 total_limit: int = 2, save_best: bool = True,
                 mode: str = "max"):
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be min/max, {mode} given")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_steps = save_steps
        self.save_best = save_best
        self.mode = mode
        self._best_score: Optional[float] = None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=total_limit, create=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "periodic"), options=options)
        self._best_dir = os.path.join(self.directory, "best")
        self._best_ckpt = ocp.StandardCheckpointer()

    def maybe_save(self, state: TrainState, step: int) -> bool:
        if self.save_steps > 0 and step > 0 and step % self.save_steps == 0:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            return True
        return False

    def save_now(self, state: TrainState, step: int) -> None:
        if self._mgr.latest_step() == step:  # periodic save already hit it
            return
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=True)

    def update_best(self, state: TrainState, score: float) -> bool:
        """Save under best/ if score improves (reference save_best_model)."""
        if not self.save_best:
            return False
        improved = (
            self._best_score is None
            or (self.mode == "max" and score > self._best_score)
            or (self.mode == "min" and score < self._best_score)
        )
        if improved:
            self._best_score = score
            path = os.path.join(self._best_dir, "state")
            self._best_ckpt.save(path, state, force=True)
            # params-only copy: loadable without reconstructing the optimizer
            # (the reference's save_best_model artifact equivalent)
            self._best_ckpt.save(
                os.path.join(self._best_dir, "params"), state.params,
                force=True)
            self._best_ckpt.wait_until_finished()
        return improved

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))

    def restore_best(self, template: TrainState) -> Optional[TrainState]:
        path = os.path.join(self._best_dir, "state")
        if not os.path.isdir(path):
            return None
        return self._best_ckpt.restore(path, target=template)

    def restore_best_params(self):
        """→ the best params pytree (no template needed), or None."""
        path = os.path.join(self._best_dir, "params")
        if not os.path.isdir(path):
            return None
        return self._best_ckpt.restore(path)

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
