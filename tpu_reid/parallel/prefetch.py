"""Device-side input prefetch for the training loops.

The BatchLoader already overlaps host decode with compute (threaded
producer, data/loader.py); this module overlaps the OTHER half of the
input pipeline — the host->device transfer and the jitted preprocess
dispatch — with the previous step's execution on the chip.

`device_prefetch` pulls batches from the (lazy) source iterator on a
background thread and applies `place` there, so `jax.device_put` /
preprocess programs are enqueued onto the device stream while the main
thread is still waiting on step N's loss. JAX dispatch is thread-safe;
on an in-order device stream the transfers simply interleave ahead of
the next step. Combined with the trainers' lag-1 loss fetch
(train/trainer.py::LossPipeline) this removes the per-step host
round-trip from the critical path — the rebuild's answer to the
reference's DataLoader worker overlap (reference: data_prepare.py:207,
num_workers=4), extended to cover the H2D stage torch leaves
synchronous.

Multi-host note: `place` runs per-process on local data only
(device_put / make_array_from_process_local_data — no collectives), so
worker-thread dispatch order cannot deadlock the collective stream; the
steps that DO carry collectives are enqueued from the main thread in
identical order on every process.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_DONE = object()


def device_prefetch(
    batches: Iterable,
    place: Optional[Callable] = None,
    depth: int = 2,
) -> Iterator:
    """Yield `place(b)` for each batch, staged `depth` ahead on a thread.

    Exceptions raised by the source iterator or by `place` re-raise in
    the consumer. Abandoning the generator (break / exception) stops the
    worker promptly.
    """
    if depth <= 0:
        for b in batches:
            yield place(b) if place is not None else b
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for b in batches:
                item = place(b) if place is not None else b
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_DONE)
        except BaseException as e:  # surface to the consumer
            if not stop.is_set():
                q.put(e)

    t = threading.Thread(
        target=worker, daemon=True, name="device_prefetch"
    )
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
