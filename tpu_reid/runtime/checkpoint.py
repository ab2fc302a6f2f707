"""Checkpoint save/restore + resume — orbax-backed.

The reference only ever saves (`torch.save` every 20 epochs,
prompt_learning.py:472-474, :591-593) and has no resume logic (SURVEY.md
§5). Here both stages checkpoint {params, opt_state, epoch, stage} and can
resume mid-run; the prompt-learner-only stage-1 artifact is saved too for
parity with the reference's `clip_model_prompter_{e}.pth`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, payload: Any, force: bool = True) -> None:
    """Save a pytree payload (params / opt_state / counters) atomically."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=force)


def load_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a payload; `template` (a matching pytree of arrays) restores
    with correct dtypes/shardings when given."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        return ckptr.restore(path, args=_ocp().args.PyTreeRestore(template))


class CheckpointManager:
    """Epoch-indexed manager: keeps the latest k checkpoints, supports
    `latest_epoch()` for resume."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval: int = 20):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, epoch: int, payload: Any,
                   last_epoch: bool = False) -> bool:
        """Reference cadence: every `save_interval` epochs and at the end
        (prompt_learning.py:472-474). Returns True when a save happened."""
        if (epoch + 1) % self.save_interval == 0 or last_epoch:
            self.save(epoch, payload)
            return True
        return False

    def save_extras(self, epoch: int, payload: Any) -> None:
        """Companion payload (optimizer state / GPA accumulator) whose
        pytree STRUCTURE differs per stage — optax states are namedtuples
        that only restore correctly against a matching template, so they
        live next to (not inside) the manager's epoch checkpoint."""
        save_checkpoint(os.path.join(self.directory, f"extras_{epoch}"),
                        payload)

    def restore_extras(self, epoch: int, template: Any) -> Optional[Any]:
        path = os.path.join(self.directory, f"extras_{epoch}")
        if not os.path.exists(path):
            return None
        return load_checkpoint(path, template)

    def save(self, epoch: int, payload: Any) -> None:
        """Async: returns once the payload is snapshotted; serialization to
        disk overlaps the next training epochs. The previous save is fenced
        first so at most one write is in flight; close() drains."""
        ocp = _ocp()
        self._mgr.wait_until_finished()
        self._mgr.save(epoch, args=ocp.args.PyTreeSave(payload))

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, epoch: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        ocp = _ocp()
        self._mgr.wait_until_finished()
        epoch = epoch if epoch is not None else self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if template is None:
            return self._mgr.restore(epoch)
        return self._mgr.restore(
            epoch, args=ocp.args.PyTreeRestore(template)
        )

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
