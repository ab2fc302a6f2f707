"""Pipelined input staging + lag-1 loss resolution.

The trainers overlap host->device transfer and the loss fetch with the
next step's dispatch (parallel/prefetch.py, trainer.LossPipeline). These
tests pin the invariants: identical results to a synchronous loop, exact
guard semantics (diverged batch skipped, NEXT batch replayed from the
restored state, snapshots never capture unverified state), and error
propagation through the worker thread.
"""

import numpy as np
import pytest

from tpu_reid.parallel.prefetch import device_prefetch
from tpu_reid.runtime.guard import TrainGuard
from tpu_reid.train.trainer import LossPipeline


def test_prefetch_order_and_place():
    out = list(device_prefetch(range(10), lambda x: x * 2, depth=3))
    assert out == [2 * i for i in range(10)]


def test_prefetch_depth_zero_is_synchronous():
    out = list(device_prefetch(range(5), lambda x: x + 1, depth=0))
    assert out == [1, 2, 3, 4, 5]


def test_prefetch_propagates_source_error():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = device_prefetch(gen(), None)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_prefetch_propagates_place_error():
    def bad_place(x):
        if x == 2:
            raise RuntimeError("transfer failed")
        return x

    it = device_prefetch(range(5), bad_place)
    assert next(it) == 0
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="transfer failed"):
        list(it)


def test_prefetch_worker_stops_on_abandon():
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = device_prefetch(gen(), None, depth=2)
    next(it)
    it.close()  # abandon mid-stream
    # worker unblocks within its 0.1 s put timeout and stops producing
    n_after_close = len(produced)
    deadline = threading.Event()
    deadline.wait(0.3)
    assert len(produced) <= n_after_close + 3  # bounded by queue depth
    assert len(produced) < 1000


class _FakeLoop:
    """Scripted host-side training loop: state is an int step counter,
    losses come from a script (NaN entries = diverged steps). Mirrors the
    trainers' dispatch/redo structure exactly."""

    def __init__(self, script, guard):
        self.script = list(script)
        self.state = 0
        self.consumed = []  # (batch, state_when_consumed)
        self.pipe = LossPipeline(guard, self._get, self._set)

    def _get(self):
        return (self.state,)

    def _set(self, state):
        (self.state,) = state

    def run(self):
        for gstep, loss in enumerate(self.script):
            self.pipe.before_step(gstep)

            def dispatch(batch=gstep, loss=loss):
                self.consumed.append((batch, self.state))
                self.state = self.state + 1
                return loss

            self.pipe.after_step(dispatch(), redo=dispatch)
        return self.pipe.drain_epoch()


def test_pipeline_no_guard_collects_all_losses():
    loop = _FakeLoop([1.0, 2.0, 3.0], guard=None)
    assert loop.run() == [1.0, 2.0, 3.0]
    assert loop.state == 3


def test_pipeline_guard_replays_next_batch_after_rollback():
    guard = TrainGuard(snapshot_every=100, max_restores=3, log=lambda *_: None)
    # batch 2 diverges; detection happens after batch 3 is dispatched
    loop = _FakeLoop([1.0, 2.0, float("nan"), 4.0, 5.0], guard)
    losses = loop.run()
    assert losses == [1.0, 2.0, 4.0, 5.0]  # NaN skipped, rest kept
    assert guard.restores == 1
    # batch 3 was dispatched twice: once from the poisoned state (discarded)
    # and once replayed from the rolled-back state
    batches = [b for b, _ in loop.consumed]
    assert batches == [0, 1, 2, 3, 3, 4]
    # the replay of batch 3 started from the snapshot state (step 0's
    # pre-state = 0), not from the poisoned post-batch-3 state
    replay_state = loop.consumed[4][1]
    assert replay_state == 0


def test_pipeline_snapshot_never_captures_unverified_state():
    # snapshot_every=2: a snapshot is due at gstep 2, right after batch 1
    # diverged. The pipeline must drain (and roll back) BEFORE capturing.
    guard = TrainGuard(snapshot_every=2, max_restores=5, log=lambda *_: None)
    loop = _FakeLoop([1.0, float("nan"), 3.0, 4.0], guard)
    losses = loop.run()
    assert losses == [1.0, 3.0, 4.0]
    # every recorded snapshot state must be one the guard verified finite:
    # the gstep-2 snapshot happened after rollback to state 0, so a later
    # failure would restore a clean state
    assert guard.restores == 1


def test_pipeline_nan_on_last_batch_rolls_back_at_drain():
    guard = TrainGuard(snapshot_every=100, max_restores=3, log=lambda *_: None)
    loop = _FakeLoop([1.0, float("nan")], guard)
    losses = loop.run()
    assert losses == [1.0]
    assert guard.restores == 1
    assert loop.state == 0  # rolled back to the step-0 snapshot


def test_pipeline_budget_still_trips():
    guard = TrainGuard(snapshot_every=100, max_restores=1, log=lambda *_: None)
    loop = _FakeLoop([float("nan")] * 4, guard)
    from tpu_reid.runtime.guard import GuardTripped

    with pytest.raises(GuardTripped):
        loop.run()
