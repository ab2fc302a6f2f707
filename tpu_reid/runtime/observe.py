"""Observability: structured metric logging + jax.profiler trace hooks.

The reference's observability is bare prints (SURVEY.md §5 — loss lines
every 100/200 iters, one final metric line). Here:
  * MetricLogger — JSONL event stream + console lines, per-phase wall-time
    accounting,
  * trace() — context manager around jax.profiler for on-demand TPU traces
    (view with tensorboard or xprof),
  * StepTimer — EMA step timing with a tunnel-safe dependency barrier.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, console: bool = True):
        self.console = console
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._phase_start: Dict[str, float] = {}

    def log(self, event: str, **fields: Any) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.console:
            kv = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in fields.items()
            )
            print(f"[{event}] {kv}")

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.log("phase", name=name, seconds=time.perf_counter() - t0)

    def close(self):
        if self._fh:
            self._fh.close()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code region (TPU timeline + HLO)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer. Call mark(output) with a device array — a scalar is
    fetched to force completion (block_until_ready is unreliable over the
    axon tunnel; a data dependency is not)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0 = time.perf_counter()

    def mark(self, output=None) -> float:
        if output is not None:
            import jax.numpy as jnp

            arr = output
            float(jnp.ravel(arr)[0])
        dt = time.perf_counter() - self._t0
        self._t0 = time.perf_counter()
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema
        )
        return dt
