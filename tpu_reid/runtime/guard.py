"""Failure detection and recovery for long training runs.

The reference has nothing here (SURVEY.md §5: no failure detection, no
elastic recovery, no fault injection anywhere in the tree); production
TPU training needs three guards this module provides:

  * TrainGuard — divergence detection + rollback: keeps a periodic host
    snapshot of (trainable, opt_state) and, when a step produces a
    non-finite loss, restores the last good snapshot and skips forward.
    Bounded by max_restores so a persistently diverging run fails loudly
    instead of looping.
  * StepWatchdog — hang detection: a context manager that fires a
    callback if a step exceeds a wall-clock budget. Device hangs on real
    hardware present as a blocked host thread (observed with the axon
    tunnel: a wedged chip blocks the dispatch indefinitely with ~0% CPU);
    the watchdog turns silence into a recorded, actionable event.
  * preemption-safe mid-run state: snapshot() captures optimizer state as
    well as parameters, so a restore resumes the *optimization
    trajectory*, not just the weights (the orbax CheckpointManager covers
    the epoch-cadence durable story; this covers the in-memory fast
    path).

Pure host-side logic — no device work beyond the jnp.isfinite check the
trainer already pays for when it fetches the loss scalar.
"""

from __future__ import annotations

import math
import threading
import time
from typing import Any, Callable, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_device(tree, like=None):
    """Re-commit a host snapshot; `like` (the live state being replaced)
    restores each leaf with its original sharding — required when the
    state lives replicated on a (possibly multi-host) mesh, where a bare
    jnp.asarray would come back as an uncommitted single-device array."""
    import jax.numpy as jnp

    if like is None:
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(
        lambda x, ref: (
            jax.device_put(np.asarray(x), ref.sharding)
            if isinstance(ref, jax.Array) else jnp.asarray(x)
        ),
        tree, like,
    )


class GuardTripped(RuntimeError):
    """Raised when failures exceed the guard's restore budget."""


class TrainGuard:
    """Divergence rollback guard.

    Usage inside a step loop (state = any pytrees that must roll back
    together — e.g. (trainable, frozen, opt_state); BN running stats live
    in `frozen`, so it belongs in the rollback set):

        guard.maybe_snapshot(step_idx, trainable, frozen, opt_state)
        (trainable, frozen, opt_state), ok = guard.check(
            loss, trainable, frozen, opt_state)
        if not ok:
            continue          # batch skipped, state rolled back

    `check` treats NaN/inf losses as failures; everything else marks the
    current state good. Restores re-use the snapshot host copies, so the
    cost of a clean run is one host copy every `snapshot_every` steps.
    """

    def __init__(
        self,
        snapshot_every: int = 50,
        max_restores: int = 3,
        log: Callable[[str], None] = print,
    ):
        self.snapshot_every = max(1, snapshot_every)
        self.max_restores = max_restores
        self.log = log
        self.restores = 0
        self.events: list[dict] = []
        self._snap: Optional[tuple] = None
        self._step = 0

    def will_snapshot(self, step: int) -> bool:
        """True when maybe_snapshot(step, ...) would capture state — lets a
        pipelined loop drain its in-flight loss first, so a snapshot never
        records parameters whose producing step is still unverified."""
        return self._snap is None or step % self.snapshot_every == 0

    def maybe_snapshot(self, step: int, *state: Any):
        self._step = step
        if self.will_snapshot(step):
            self._snap = (step, tuple(_to_host(s) for s in state))

    def check(self, loss: float, *state: Any):
        """Returns (state_tuple, ok)."""
        if math.isfinite(float(loss)):
            return state, True
        self.restores += 1
        event = {
            "step": self._step,
            "loss": float(loss),
            "restored_to": self._snap[0] if self._snap else None,
            "restores": self.restores,
        }
        self.events.append(event)
        self.log(
            f"[guard] non-finite loss at step {self._step} "
            f"(restore {self.restores}/{self.max_restores}, "
            f"rolling back to step {event['restored_to']})"
        )
        if self.restores > self.max_restores:
            raise GuardTripped(
                f"{self.restores} non-finite losses exceed the budget "
                f"of {self.max_restores}; last events: {self.events[-3:]}"
            )
        assert self._snap is not None, "check() before any maybe_snapshot()"
        _, host_state = self._snap
        return tuple(
            _to_device(s, like=live)
            for s, live in zip(host_state, state)
        ), False


class StepWatchdog:
    """Wall-clock hang detector for device steps.

    with StepWatchdog(timeout_s=300, on_hang=cb) as wd:
        loss = step(...)        # if this blocks > timeout, cb fires once

    The callback runs on a daemon timer thread; it cannot unblock the
    device call, but it records the hang (and can e.g. write a marker
    file, emit metrics, or os.kill the process if the caller chooses).
    """

    def __init__(
        self,
        timeout_s: float,
        on_hang: Optional[Callable[[float], None]] = None,
        log: Callable[[str], None] = print,
    ):
        self.timeout_s = timeout_s
        self.on_hang = on_hang
        self.log = log
        self.hung = False
        self._timer: Optional[threading.Timer] = None
        self._t0 = 0.0

    def _fire(self):
        self.hung = True
        elapsed = time.monotonic() - self._t0
        self.log(
            f"[watchdog] step exceeded {self.timeout_s:.0f}s "
            f"(elapsed {elapsed:.0f}s) — device hang suspected"
        )
        if self.on_hang is not None:
            self.on_hang(elapsed)

    def __enter__(self):
        self._t0 = time.monotonic()
        self._timer = threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, *exc):
        if self._timer is not None:
            self._timer.cancel()
        return False
