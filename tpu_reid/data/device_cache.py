"""Device-resident training-image cache.

Through a remote-device link (or any host-bound input pipeline) the
per-batch host->device image transfer dominates the training step: at
Market-1501 scale the measured stage-2 epoch wall was ~17x the pure step
compute (BASELINE.md r2), entirely input-bound — the reference hides some
of this with DataLoader workers (reference: data_prepare.py:207,
num_workers=4) but still re-ships every image every epoch.

A ReID train split is small (Market-1501: 12,936 images x 256x128x3 uint8
= 1.27 GB), so the TPU-native answer is to ship it ONCE: decode+resize on
the host, upload in fenced chunks, keep the whole split resident in HBM
as one (N, H, W, 3) uint8 array, and serve every epoch's PK-sampled
batches as an on-device gather (jnp.take) feeding the jitted train
transform. After the one-time upload, epochs run at step-compute speed —
no decode, no transfer, no host in the loop.

Chunked upload: single large device_puts have been observed to wedge the
remote tunnel (~100 MB); chunks default to 256 images (~25 MB at
256x128) and each is fenced with a scalar fetch before the next starts.

Multi-chip (`mesh=`): the split is sharded over the mesh's "data" axis —
each chip holds N/D contiguous rows (zero-padded to divisibility) and a
batch gather runs as one jitted program whose output is batch-sharded
over the same axis, XLA inserting the cross-chip row exchange over ICI
(a PK-sampled batch touches ~bs rows, a few MB — negligible against
re-shipping images from the host every epoch). Batches are bit-identical
to the single-device cache and to the host BatchLoader path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class DeviceImageCache:
    """Upload a record list's images once; serve index-gather batches.

    Produces batches bit-identical to the host BatchLoader path: the same
    decode+resize runs on the host at build time, so `gather(idx)` equals
    stacking those images host-side and device_put-ing them.

    mesh: optional jax.sharding.Mesh — shard the resident images over the
    "data" axis and emit batch-sharded gathers (see module docstring).
    """

    def __init__(
        self,
        records: Sequence,
        size_hw,
        chunk: int = 256,
        log: Optional[Callable[[str], None]] = None,
        mesh=None,
    ):
        import jax
        import jax.numpy as jnp

        from tpu_reid.data.loader import BatchLoader

        self.n = len(records)
        self.size_hw = tuple(size_hw)
        self.mesh = mesh
        self.pids = np.asarray([r[1] for r in records], np.int32)
        self.camids = np.asarray([r[2] for r in records], np.int32)

        parts = []
        loader = BatchLoader(records, chunk, size_hw)  # sequential order
        done = 0
        for b in loader:
            k = b.n_valid
            arr = jax.device_put(np.ascontiguousarray(b.images[:k]))
            # fence: force the transfer to complete before enqueueing the
            # next chunk (remote tunnels ack early on block_until_ready)
            float(arr[0, 0, 0, 0])
            parts.append(arr)
            done += k
            if log is not None:
                log(f"device cache: {done}/{self.n} images staged")
        assert done == self.n, (done, self.n)
        if mesh is None:
            self.images = jax.jit(
                lambda ps: jnp.concatenate(ps, axis=0)
            )(parts)
            float(self.images[0, 0, 0, 0])
            self._gather = jax.jit(
                lambda imgs, idx: jnp.take(imgs, idx, axis=0)
            )
        else:
            from tpu_reid.parallel.mesh import data_sharding

            dat = data_sharding(mesh)
            n_shards = mesh.shape["data"]
            pad = (-self.n) % n_shards  # P("data") needs divisibility

            def assemble(ps):
                x = jnp.concatenate(ps, axis=0)
                return jnp.pad(x, [(0, pad), (0, 0), (0, 0), (0, 0)])

            # one program: concat + pad on the staging device, output
            # scattered into per-chip contiguous row shards
            self.images = jax.jit(assemble, out_shardings=dat)(parts)
            float(jnp.asarray(self.images[0, 0, 0, 0]))
            # gather: replicated indices, batch-sharded output; XLA turns
            # the cross-shard row fetch into ICI collectives
            self._gather = jax.jit(
                lambda imgs, idx: jnp.take(imgs, idx, axis=0),
                out_shardings=dat,
            )

    def nbytes(self) -> int:
        h, w = self.size_hw
        return self.n * h * w * 3

    def gather(self, idx: np.ndarray):
        """(B,) int32 indices -> (B, H, W, 3) uint8 on device (batch-sharded
        over the "data" axis when the cache was built with a mesh)."""
        import jax.numpy as jnp

        return self._gather(self.images, jnp.asarray(idx, jnp.int32))

    def epoch_index_batches(
        self, order, batch_size: int, drop_tail: bool = False
    ) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (idx, pids, camids, valid) per batch for an epoch order.

        `order`: an iterable of index arrays (PKSampler.epoch()) or a flat
        index array; the tail batch is zero-padded with valid=False rows,
        matching BatchLoader's fixed-shape contract (data/loader.py).
        """
        if hasattr(order, "__iter__") and not isinstance(order, np.ndarray):
            flat = np.concatenate([np.asarray(o) for o in order])
        else:
            flat = np.asarray(order)
        b = batch_size
        for lo in range(0, len(flat), b):
            sel = flat[lo : lo + b].astype(np.int32)
            if len(sel) < b:
                if drop_tail:
                    return
                pad = np.zeros((b - len(sel),), np.int32)
                valid = np.concatenate(
                    [np.ones(len(sel), bool), np.zeros(len(pad), bool)]
                )
                sel = np.concatenate([sel, pad])
            else:
                valid = np.ones((b,), bool)
            # zero the metadata of padded rows (BatchLoader contract); the
            # gathered image rows are masked by `valid` in every loss
            pids = np.where(valid, self.pids[sel], 0).astype(np.int32)
            camids = np.where(valid, self.camids[sel], 0).astype(np.int32)
            yield sel, pids, camids, valid
