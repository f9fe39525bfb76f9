"""Checkpoint save/load (orbax).

Replaces the reference's torch.save/torch.load + prefix-tolerant
`reload_model` (trainer.py:342-356, utils/util_net.py:86-98) with orbax
pytree checkpoints.  Train-state checkpoints carry params, optimizer
moments, EMA, and the step counter — resuming replays the LR schedule
exactly because the step lives in the state (reference replays it manually
at trainer.py:165-167; it deliberately does NOT save optimizer moments,
we do — strictly better resume fidelity).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["save_params", "load_params", "save_train_state",
           "restore_train_state", "AsyncSaver"]


def _ckptr():
    return ocp.StandardCheckpointer()


def save_params(path: str | Path, params: Any) -> None:
    path = Path(path).resolve()
    c = _ckptr()
    c.save(path, params, force=True)
    c.wait_until_finished()


def load_params(path: str | Path) -> Any:
    return _ckptr().restore(Path(path).resolve())


def save_train_state(path: str | Path, state: Any, step: int | None = None) -> None:
    path = Path(path).resolve()
    if step is not None:
        path = path / f"step_{step:08d}"
    c = _ckptr()
    c.save(path, state, force=True)
    c.wait_until_finished()


def restore_train_state(path: str | Path, template: Any) -> Any:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    return _ckptr().restore(Path(path).resolve(), template)


class AsyncSaver:
    """Non-blocking train-state saves.

    orbax's StandardCheckpointer is an AsyncCheckpointer: `save` performs the
    device->host copy synchronously (so later in-loop rebinding of the state
    cannot race the write) and serializes to disk on a background thread —
    the train loop keeps stepping while the checkpoint lands.  At most one
    save is in flight: a new `save` first joins the previous one (which also
    surfaces any background write error at a well-defined point).  The
    reference's torch.save blocks the loop for the full write
    (trainer.py:342-356); this hides it behind compute.
    """

    def __init__(self):
        self._c = ocp.StandardCheckpointer()

    def save(self, path: str | Path, state: Any, step: int | None = None) -> Path:
        path = Path(path).resolve()
        if step is not None:
            path = path / f"step_{step:08d}"
        self._c.wait_until_finished()
        self._c.save(path, state, force=True)
        return path

    def wait(self) -> None:
        """Join the in-flight save (raises if the background write failed)."""
        self._c.wait_until_finished()

    def close(self) -> None:
        self._c.wait_until_finished()
        self._c.close()
