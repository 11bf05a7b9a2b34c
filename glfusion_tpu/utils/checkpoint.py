"""Orbax checkpointing: params + batch stats + optimizer state + epoch.

Replaces the reference's ``torch.save({'network': state_dict})`` +
``latest.ckpt`` text pointer (``main.py:857-872``) with atomic, async-capable
Orbax checkpoints that also persist optimizer state (the reference dropped it
— its resume was silently wrong; we keep it).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        """``max_to_keep=None`` (default) keeps every saved epoch — the
        reference writes net_{epoch:05}.pth per epoch and its sweep
        (main.py:316-323) selects the best epoch >= 50 over all of them,
        so bounded retention would silently shrink the sweep candidates.
        Pass an int (cfg.train.ckpt_keep / --ckpt-keep) to bound disk."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state, epoch: int, wait: bool = False) -> None:
        """Checkpoint the full train state at ``epoch``.

        Async by default: Orbax snapshots device arrays to host inside
        ``save()`` (so later donated-buffer reuse by train steps cannot
        corrupt the data) and serializes/writes in the background —
        training continues while the previous checkpoint hits disk.
        Overlapping saves are serialized by Orbax. ``wait=True`` (or
        ``wait()``) blocks until everything is durable; every read path
        below waits first.
        """
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until all in-flight async saves are durable on disk."""
        self._mgr.wait_until_finished()

    def all_steps(self) -> list:
        """Sorted saved epochs (the sweep-eval substrate, main.py:316-323)."""
        self._mgr.wait_until_finished()
        return sorted(int(s) for s in self._mgr.all_steps())

    def restore_step(self, state, step: int):
        """Restore one specific epoch's state (or None)."""
        self._mgr.wait_until_finished()
        if step not in set(self._mgr.all_steps()):
            return None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_latest(self, state) -> Optional[Tuple[object, int]]:
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return None
        new_state = self.restore_step(state, step)
        return new_state, int(step) + 1
