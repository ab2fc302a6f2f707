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
