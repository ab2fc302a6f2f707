"""Multi-host (multi-process) embedding extraction over one global mesh.

The reference is single-GPU (SURVEY.md §2.6: all placement is `.cuda()`
literals; its deepspeed/mpi4py requirements are inert). On TPU pods the
natural scale-out for the extraction sweep — the throughput north star —
is *hosts*: each host feeds its own slice of every global batch to its
local chips (input rides the host's PCIe/DCN link, never the ICI), the
encoder runs embarrassingly parallel (params replicated, no collectives),
and features come back fully replicated for the retrieval tail.

Topology-by-construction:
  * one `jax.sharding.Mesh` over ALL devices of ALL processes ("data"
    axis; device order groups each process's chips together),
  * every global batch is assembled with
    `jax.make_array_from_process_local_data`: host p decodes only the rows
    its own chips consume — the disk->host->device path scales linearly
    with hosts and no image crosses DCN,
  * the one cross-host transfer is the final feature all-gather (a few
    hundred MB at MSMT17 scale), after which the retrieval tail runs
    process-locally and identically on every host.

Verified end to end on real multi-process meshes (2 processes x N CPU
devices with gloo collectives) in tests/test_multihost.py: bitwise-equal
features/metrics across hosts and parity with the single-process sweep.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> Tuple[int, int]:
    """Join the multi-process runtime. Call BEFORE any device use.

    Wraps ``jax.distributed.initialize`` (the TPU-pod / GPU-cluster entry
    point); afterwards ``jax.devices()`` spans every process and
    collectives cross hosts (ICI within a slice, gloo on CPU test meshes).
    Returns (process_index, process_count).
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, (
        jax.process_count(), num_processes,
    )
    return jax.process_index(), jax.process_count()


def host_slice_records(
    records: Sequence,
    global_batch: int,
    process_id: int,
    process_count: int,
) -> Tuple[list, int, int]:
    """This host's record stream for a lock-step global sweep.

    The global order is ``records`` padded (wrap-around) to a whole number
    of global batches; batch i covers rows [i*B, (i+1)*B) and host p owns
    the contiguous sub-slice [p*B/P, (p+1)*B/P) of each. Concatenating
    host p's sub-slices gives a per-host list that a plain fixed-shape
    ``BatchLoader(batch_size=B/P)`` walks in exactly the right order — the
    loader itself needs no multi-host awareness.

    Returns (host_records, n_valid_total, n_batches). Padded wrap-around
    rows are dropped by the caller after the sweep (they are tail rows of
    the LAST global batch, i.e. global rows [n_valid_total:]).
    """
    assert global_batch % process_count == 0, (
        f"global batch {global_batch} must divide by process count "
        f"{process_count}"
    )
    per_host = global_batch // process_count
    n = len(records)
    assert n > 0, "empty record list"
    n_batches = -(-n // global_batch)
    padded = list(records)
    while len(padded) < n_batches * global_batch:
        padded.extend(records[: n_batches * global_batch - len(padded)])
    host_records = []
    for i in range(n_batches):
        base = i * global_batch + process_id * per_host
        host_records.extend(padded[base : base + per_host])
    return host_records, n, n_batches


def replicate_multihost(mesh, tree):
    """Replicate a host-local pytree onto every device of a multi-process
    mesh (every process passes the same values — true for converted
    checkpoints and seeded inits)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x)
        ),
        tree,
    )


def shard_batch_multihost(mesh, tree):
    """Multi-process analog of ``mesh.shard_batch``: every process passes
    the contiguous batch rows its OWN devices consume (global batch /
    process_count, e.g. from ``host_slice_records``) and gets back the
    global batch-sharded pytree. Training steps built with
    ``make_stage1_step/make_stage2_step(mesh=...)`` consume these directly
    — gradient psum then rides ICI within a host and DCN across hosts
    (verified for loss-trajectory parity with the single-process mesh in
    tests/test_multihost.py)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    dat = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            dat, np.asarray(x)
        ),
        tree,
    )


def extract_embeddings_multihost(
    extractor,
    params: dict,
    records: Sequence,
    global_batch: int,
    size_hw,
    mesh,
    hang_timeout_s: float = 600.0,
    on_hang=None,
    replicate_params: bool = True,
    loader_kwargs: Optional[dict] = None,
    cv_ids_of=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Lock-step multi-host sweep; returns (features, pids, camids, seqids)
    as host numpy, identical on every process.

    cv_ids_of(batch) -> (B_local,) int ids feeds the extractor's third
    argument (pair with make_extractor(with_cv_ids=True) — the SIE path).

    extractor: a ``make_extractor(..., mesh=mesh)`` step over the GLOBAL
    mesh. Each process decodes only its own slice of every global batch
    (host_slice_records); `jax.make_array_from_process_local_data` stitches
    the per-host image blocks into the (B, H, W, 3) global array without
    any cross-host image traffic. Features are all-gathered once at the
    end (the single DCN transfer) so the retrieval tail can run
    process-locally.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.runtime.guard import StepWatchdog

    pid, pcount = jax.process_index(), jax.process_count()
    host_records, n_valid, n_batches = host_slice_records(
        records, global_batch, pid, pcount
    )
    per_host = global_batch // pcount
    n_data = mesh.shape["data"]
    assert global_batch % n_data == 0, (
        f"global batch {global_batch} must divide by the data axis "
        f"{n_data}"
    )

    dat = NamedSharding(mesh, P("data"))
    if replicate_params:
        params = replicate_multihost(mesh, params)

    loader = BatchLoader(
        host_records, per_host, size_hw, **(loader_kwargs or {})
    )
    feats = []
    for b in loader:
        assert b.valid.all()  # padding is by wrap-around records
        images = jax.make_array_from_process_local_data(dat, b.images)
        extra = ()
        if cv_ids_of is not None:
            extra = (jax.make_array_from_process_local_data(
                dat, np.asarray(cv_ids_of(b), np.int32)
            ),)
        with StepWatchdog(hang_timeout_s, on_hang=on_hang):
            feats.append(extractor(params, images, *extra))
    assert len(feats) == n_batches, (len(feats), n_batches)

    # one all-gather: features become fully replicated, then host numpy
    gather = jax.jit(
        lambda xs: jnp.concatenate(xs, axis=0),
        out_shardings=NamedSharding(mesh, P()),
    )
    all_feats = np.asarray(gather(feats))[:n_valid]

    # metadata comes from the (globally known) record list, not the sweep
    meta = np.asarray([r[1:5] for r in records], np.int64).T
    return all_feats, meta[0], meta[1], meta[2]
