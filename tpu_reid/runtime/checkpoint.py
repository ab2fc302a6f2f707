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


# ---------------------------------------------------------------------------
# two-stage training orchestration (shared by the prompt_learning and
# multitask CLIs)
# ---------------------------------------------------------------------------
#
# Stage markers stored with the params: stage 0 = in stage 1, stage 1 +
# epoch_in_stage -1 = stage 1 done, stage 1 + epoch e = in stage 2,
# stage 2 = finished. Companion extras carry the optimizer state and,
# when used, the GPA accumulator and the XBM banks.


def two_stage_cb(mgr: CheckpointManager, stage: int, step_of):
    """checkpoint_cb for run_stage{1,2} / run_mt_stage{1,2}: periodic param
    saves (reference cadence) with optimizer/GPA/XBM companions. step_of
    maps the in-stage epoch to the manager's global step."""

    def _cb(e, p, state):
        if mgr.maybe_save(
            step_of(e), {"params": p, "stage": stage, "epoch_in_stage": e}
        ):
            extras = {"opt_state": state["opt_state"]}
            if state.get("gpa") is not None:
                extras["gpa"] = state["gpa"]
            if state.get("xbms") is not None:
                extras["xbms"] = state["xbms"]
            mgr.save_extras(step_of(e), extras)

    return _cb


def two_stage_resume(
    mgr: CheckpointManager,
    params,
    s1_opt_template,
    s2_opt_template,
    gpa1_used: bool,
    gpa2_used: bool,
    xbm_template=None,
    log=print,
):
    """Restore the newest two-stage checkpoint.

    Returns (params, done_stage, stage1_kwargs, stage2_kwargs) where the
    kwargs feed run_stage{1,2} / run_mt_stage{1,2}'s start_epoch /
    init_opt_state / init_gpa (/ init_xbms when xbm_template is given).
    s{1,2}_opt_template(params) build fresh optimizer states matching the
    trainers' pytree structure; the gpa*_used flags must mirror whether
    the corresponding stage actually accumulates a GPA (the extras
    template must match what two_stage_cb saved).

    A resumed run must use the SAME total epoch counts as the interrupted
    one: the GPA gaussian weights normalize over the planned epoch count
    (optim.gauss_weights), so changing --epochs_stage* across a resume
    silently re-weights the accumulated average."""
    kw1 = {"start_epoch": 1, "init_opt_state": None, "init_gpa": None}
    kw2 = {"start_epoch": 0, "init_opt_state": None, "init_gpa": None}
    if xbm_template is not None:
        kw2["init_xbms"] = None
    if mgr.latest_epoch() is None:
        return params, 0, kw1, kw2
    step = mgr.latest_epoch()
    restored = mgr.restore(
        step, template={"params": params, "stage": 0, "epoch_in_stage": 0}
    )
    import numpy as _np

    params = restored["params"]
    done = int(_np.asarray(restored["stage"]))
    e_in = int(_np.asarray(restored["epoch_in_stage"]))

    def _warn_missing(stage_no):
        log(
            f"[resume] WARNING: checkpoint step {step} has no extras "
            f"companion (crash between param save and extras save?); "
            f"restarting stage {stage_no} from epoch 1 on the restored "
            f"params — the trajectory will differ from an uninterrupted run"
        )

    if done == 0 and e_in >= 0:
        tmpl = {"opt_state": s1_opt_template(params)}
        if gpa1_used:
            tmpl["gpa"] = params
        extras = mgr.restore_extras(step, tmpl)
        if extras is None:
            _warn_missing(1)
        else:
            kw1 = {"start_epoch": e_in + 1,
                   "init_opt_state": extras["opt_state"],
                   "init_gpa": extras.get("gpa")}
    elif done == 1 and e_in >= 0:
        tmpl = {"opt_state": s2_opt_template(params)}
        if gpa2_used:
            tmpl["gpa"] = params
        if xbm_template is not None:
            tmpl["xbms"] = xbm_template()
        extras = mgr.restore_extras(step, tmpl)
        if extras is None:
            _warn_missing(2)
        else:
            kw2 = {"start_epoch": e_in + 1,
                   "init_opt_state": extras["opt_state"],
                   "init_gpa": extras.get("gpa")}
            if xbm_template is not None:
                kw2["init_xbms"] = extras.get("xbms")
    return params, done, kw1, kw2
