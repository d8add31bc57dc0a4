"""Checkpoint / resume via orbax: full training state (params, optimizer,
env state, RNG, update counter) for EXACT resume.

Rebuild of the reference's torch.save checkpoints (SURVEY.md §5:
`experiments/<run>/*.pt`, resume via --load-model-path), upgraded per the
SURVEY plan: the whole RunnerState pytree is saved, so a resumed run
continues the same trajectory streams and optimizer momentum (the reference
only saved policy+optimizer).
"""

from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


class Checkpointer:
    """The manager (and the directory) is created lazily on first use, and
    restore paths refuse to create anything: a restore-only caller with a
    typo'd run name gets FileNotFoundError, not an empty fake run directory
    on disk."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.dir = Path(directory).resolve()
        self._max_to_keep = max_to_keep
        self._mgr = None

    @property
    def mgr(self) -> ocp.CheckpointManager:
        if self._mgr is None:
            self.dir.mkdir(parents=True, exist_ok=True)
            self._mgr = ocp.CheckpointManager(
                self.dir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self._max_to_keep, create=True
                ),
            )
        return self._mgr

    def _require_existing(self):
        if self._mgr is None and not self.dir.is_dir():
            raise FileNotFoundError(f"no checkpoint directory {self.dir}")

    def save(self, step: int, runner) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(runner))

    def restore(self, runner_template, step: int | None = None):
        """Restore into the structure (and shardings) of runner_template."""
        self._require_existing()
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.dir}")
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(runner_template)
        )
        return restored, step

    def restore_raw(self, step: int | None = None):
        """Restore without a template (plain arrays in the saved tree
        structure). Use when only a subtree is needed (e.g. params for
        weight export) and shapes like num_envs may differ from the
        current config."""
        self._require_existing()
        step = self.mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.dir}")
        return self.mgr.restore(step), step

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
