"""Checkpoint / resume via orbax (SURVEY.md §5: replaces PL ModelCheckpoint
every_n_epochs semantics, main.py:61 + find_checkpoint_path:24-33)."""

from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


def _manager(directory: str | Path) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
    )


def save(directory: str | Path, state, step: int) -> None:
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str | Path) -> int | None:
    """Latest-epoch checkpoint discovery (reference find_checkpoint_path)."""
    if not Path(directory).exists():
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory: str | Path, target, step: int | None = None):
    """Restore into the structure of ``target`` (a concrete TrainState)."""
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return out
