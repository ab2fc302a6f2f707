"""Runtime subsystem tests: orbax checkpoint manager, metric logger, timer."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_reid.runtime.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from tpu_reid.runtime.observe import MetricLogger, StepTimer


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    payload = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "epoch": 7,
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, payload)
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(np.asarray(restored["epoch"])) == 7


@pytest.mark.slow
def test_manager_cadence_and_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "run"), max_to_keep=2,
                            save_interval=20)
    assert mgr.latest_epoch() is None
    payload = lambda e: {"w": jnp.full((2,), float(e)), "stage": 0}
    # reference cadence: every 20 epochs + final (prompt_learning.py:472-474)
    for epoch in range(40):
        mgr.maybe_save(epoch, payload(epoch), last_epoch=(epoch == 39))
    assert mgr.latest_epoch() == 39
    restored = mgr.restore()
    np.testing.assert_array_equal(np.asarray(restored["w"]), [39.0, 39.0])
    mgr.close()


def test_metric_logger_jsonl(tmp_path):
    log = MetricLogger(str(tmp_path), console=False)
    log.log("train", loss=1.5, step=3)
    with log.phase("extract"):
        pass
    log.close()
    lines = [
        json.loads(line)
        for line in open(tmp_path / "metrics.jsonl").read().splitlines()
    ]
    assert lines[0]["event"] == "train" and lines[0]["loss"] == 1.5
    assert lines[1]["event"] == "phase" and lines[1]["name"] == "extract"
    assert lines[1]["seconds"] >= 0


def test_step_timer():
    t = StepTimer()
    dt = t.mark(jnp.ones((2, 2)))
    assert dt > 0
    assert t.ema is not None


def test_checkpoint_extras_roundtrip(tmp_path):
    """Optimizer-state companion checkpoints restore with exact optax
    namedtuple structure (mid-run resume, VERDICT-era gap: save-only)."""
    import optax

    from tpu_reid.runtime.checkpoint import CheckpointManager

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    # advance one step so moments are non-trivial
    g = jax.tree.map(jnp.ones_like, params)
    up, state = opt.update(g, state, params)

    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    assert mgr.maybe_save(0, {"params": params, "stage": 0,
                              "epoch_in_stage": 0})
    mgr.save_extras(0, {"opt_state": state})
    restored = mgr.restore_extras(0, {"opt_state": opt.init(params)})
    assert restored is not None
    got = restored["opt_state"]
    assert jax.tree.structure(got) == jax.tree.structure(state)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert mgr.restore_extras(7, {"opt_state": opt.init(params)}) is None
    mgr.close()


def test_two_stage_cb_resume_roundtrip(tmp_path):
    """two_stage_cb saves the stage marker + extras (opt/gpa/xbms) and
    two_stage_resume restores them into the trainers' kwargs — both
    mid-stage branches, through real orbax files."""
    from tpu_reid.runtime.checkpoint import (
        CheckpointManager, two_stage_cb, two_stage_resume,
    )

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    opt1 = {"mu": jnp.full((4,), 0.25)}
    opt2 = {"nu": jnp.full((2,), 0.5)}
    gpa = jax.tree.map(lambda x: x * 2.0, params)
    xbms = [{"bank": jnp.zeros((3, 2)), "fill": jnp.int32(1)},
            {"bank": jnp.ones((3, 2)), "fill": jnp.int32(2)}]

    # --- mid-stage-1 (no gpa for stage 1 here) ---
    mgr = CheckpointManager(str(tmp_path / "a"), save_interval=1)
    cb1 = two_stage_cb(mgr, stage=0, step_of=lambda e: e)
    cb1(1, params, {"opt_state": opt1, "gpa": None})
    p, done, kw1, kw2 = two_stage_resume(
        mgr, jax.tree.map(jnp.zeros_like, params),
        s1_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt1),
        s2_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt2),
        gpa1_used=False, gpa2_used=True,
        xbm_template=lambda: [jax.tree.map(jnp.zeros_like, x) for x in xbms],
    )
    assert done == 0 and kw1["start_epoch"] == 2
    np.testing.assert_array_equal(np.asarray(p["w"]), np.arange(4.0))
    np.testing.assert_array_equal(
        np.asarray(kw1["init_opt_state"]["mu"]), 0.25 * np.ones(4)
    )
    assert kw1["init_gpa"] is None
    mgr.close()

    # --- mid-stage-2 (gpa + xbm banks) ---
    mgr = CheckpointManager(str(tmp_path / "b"), save_interval=1)
    cb2 = two_stage_cb(mgr, stage=1, step_of=lambda e: 10 + e)
    cb2(3, params, {"opt_state": opt2, "gpa": gpa, "xbms": xbms})
    p, done, kw1, kw2 = two_stage_resume(
        mgr, jax.tree.map(jnp.zeros_like, params),
        s1_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt1),
        s2_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt2),
        gpa1_used=False, gpa2_used=True,
        xbm_template=lambda: [jax.tree.map(jnp.zeros_like, x) for x in xbms],
    )
    assert done == 1 and kw2["start_epoch"] == 4
    np.testing.assert_array_equal(
        np.asarray(kw2["init_opt_state"]["nu"]), 0.5 * np.ones(2)
    )
    np.testing.assert_array_equal(
        np.asarray(kw2["init_gpa"]["w"]), 2.0 * np.arange(4.0)
    )
    np.testing.assert_array_equal(
        np.asarray(kw2["init_xbms"][1]["bank"]), np.ones((3, 2))
    )
    assert int(kw2["init_xbms"][1]["fill"]) == 2
    mgr.close()

    # --- missing extras: warn, restart stage from scratch ---
    mgr = CheckpointManager(str(tmp_path / "c"), save_interval=1)
    mgr.save(5, {"params": params, "stage": 0, "epoch_in_stage": 5})
    warnings = []
    p, done, kw1, kw2 = two_stage_resume(
        mgr, jax.tree.map(jnp.zeros_like, params),
        s1_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt1),
        s2_opt_template=lambda p: jax.tree.map(jnp.zeros_like, opt2),
        gpa1_used=False, gpa2_used=False, log=warnings.append,
    )
    assert done == 0 and kw1["start_epoch"] == 1
    assert kw1["init_opt_state"] is None
    assert warnings and "WARNING" in warnings[0]
    mgr.close()
