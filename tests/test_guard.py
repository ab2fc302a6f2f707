"""Failure-detection subsystem: divergence rollback + hang watchdog.

The reference has no failure handling at all (SURVEY.md §5); these tests
pin the recovery semantics: a poisoned batch's non-finite loss rolls the
full optimization state back to the last snapshot (including BNNeck
running stats), training continues, and the restore budget bounds
persistent divergence.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_trainer import tiny_model, fake_batches
from tpu_reid.models import reid_clip as M
from tpu_reid.runtime.guard import GuardTripped, StepWatchdog, TrainGuard
from tpu_reid.train import trainer as TR


def test_guard_rolls_back_on_nan():
    g = TrainGuard(snapshot_every=1, max_restores=2, log=lambda s: None)
    t0 = {"w": jnp.ones((2,))}
    o0 = {"m": jnp.zeros((2,))}
    g.maybe_snapshot(0, t0, o0)
    t_bad = {"w": jnp.asarray([np.nan, 1.0])}
    (t_r, o_r), ok = g.check(float("nan"), t_bad, o0)
    assert not ok and g.restores == 1
    np.testing.assert_array_equal(np.asarray(t_r["w"]), [1.0, 1.0])
    (t_k, _), ok = g.check(0.5, t_bad, o0)
    assert ok and t_k is t_bad  # finite loss keeps current state


def test_guard_budget_trips():
    g = TrainGuard(snapshot_every=1, max_restores=1, log=lambda s: None)
    g.maybe_snapshot(0, {"w": jnp.ones(1)})
    g.check(float("inf"), {"w": jnp.ones(1)})
    with pytest.raises(GuardTripped):
        g.check(float("nan"), {"w": jnp.ones(1)})


@pytest.mark.slow
def test_stage2_recovers_from_poisoned_batch():
    """One NaN-image batch mid-epoch: the run finishes, parameters are
    finite, and exactly one restore event is recorded."""
    mcfg, params = tiny_model("coop")
    batches = fake_batches(3, bs=8)
    poisoned = list(batches)
    img, lab, valid = poisoned[1]
    poisoned[1] = (img.at[0, 0, 0, 0].set(jnp.nan), lab, valid)

    guard = TrainGuard(snapshot_every=1, max_restores=3, log=lambda s: None)
    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(poisoned), epochs=1,
        log=lambda s: None, guard=guard,
    )
    assert guard.restores == 1
    assert guard.events[0]["step"] == 1
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_stage2_poisoned_equals_skipping_the_batch():
    """Rollback semantics: a poisoned batch leaves exactly the state the
    run would have had if the batch had never been delivered."""
    mcfg, params = tiny_model("coop")
    clean = fake_batches(3, bs=8)
    poisoned = list(clean)
    img, lab, valid = poisoned[1]
    poisoned[1] = (img * jnp.inf, lab, valid)

    guard = TrainGuard(snapshot_every=1, max_restores=3, log=lambda s: None)
    got = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(poisoned), epochs=1,
        log=lambda s: None, guard=guard,
    )
    skipped = [clean[0], clean[2]]
    want = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(skipped), epochs=1,
        log=lambda s: None,
    )
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_stage1_live_guard():
    mcfg, params = tiny_model("ivlp")
    batches = fake_batches(2, bs=8)
    img, lab, valid = batches[0]
    batches[0] = (img.at[:].set(jnp.nan), lab, valid)
    guard = TrainGuard(snapshot_every=1, max_restores=3, log=lambda s: None)
    out = TR.run_stage1(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=1,
        log=lambda s: None, guard=guard,
    )
    assert guard.restores == 1
    for leaf in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_watchdog_fires_and_cancels():
    fired = []
    with StepWatchdog(0.05, on_hang=fired.append, log=lambda s: None) as wd:
        time.sleep(0.15)
    assert wd.hung and len(fired) == 1

    with StepWatchdog(5.0, on_hang=fired.append, log=lambda s: None) as wd:
        pass
    time.sleep(0.1)
    assert not wd.hung and len(fired) == 1
