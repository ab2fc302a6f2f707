"""Sharded gallery/query embedding extraction — the throughput north star
(BASELINE.json: batched extraction across chips, >=1e4 emb/s/chip).

The encoder sweep is one jitted program per (batch_shape): input batch
sharded over the "data" mesh axis, params replicated, output features
sharded the same way and LEFT ON DEVICE for the retrieval tail (the
reference round-trips every batch through numpy — evaluate.py:107).

Flip-TTA (reference: zero_shot_learning.py:103-128, prompt_learning.py:
767-776) runs both passes inside the same program so the flip costs one
fused encoder call, not a second loader sweep.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpu_reid.data.transforms import DevicePreprocess
from tpu_reid.parallel.mesh import data_sharding, replicated


def make_extractor(
    embed_fn: Callable[..., jax.Array],
    preprocess: DevicePreprocess,
    mesh: Optional[Mesh] = None,
    flip_tta: bool = True,
    dtype=jnp.bfloat16,
    with_cv_ids: bool = False,
    fold=None,
):
    """Build a jitted sharded step: uint8 images -> embeddings.

    embed_fn(params, images_normalized) -> (B, E); with flip_tta the plain
    and flipped passes are averaged (reference: zero_shot_learning.py:
    117-125 divides by 2 — the mean, not the sum, matters for mm mode where
    the two halves of the embedding have independent scales).

    with_cv_ids=True: the step takes (params, images_u8, cv_ids) and
    embed_fn takes (params, x, cv_ids) — the SIE camera-embedding path
    (the flipped TTA pass keeps the same camera ids).

    fold: optional params -> params transform that folds the input
    normalization into the patch-embed weights (e.g.
    models.reid_clip.fold_input_norm / models.vit.fold_visual_input_norm).
    When given, the step applies it inside the jitted program (negligible:
    one (p, p, 3, width) rescale) and feeds RAW-scale images — the
    normalization pass disappears (exact math, ~3 ms/batch at B=512 on
    v5e; works for live mid-training params too)."""

    def step(params, images_u8, *cv):
        if fold is not None:
            params = fold(params)
            x = preprocess.eval_batch_raw(images_u8).astype(dtype)
        else:
            x = preprocess.eval_batch(images_u8).astype(dtype)
        feats = embed_fn(params, x, *cv)
        if flip_tta:
            feats = (feats + embed_fn(params, x[:, :, ::-1], *cv)) * 0.5
        return feats.astype(jnp.float32)

    if mesh is None:
        return jax.jit(step)

    # shard_map: each device runs the whole step (incl. Pallas kernels,
    # which do not auto-partition under plain sharded jit) on its local
    # batch shard; params are replicated, no collectives needed.
    from jax.sharding import PartitionSpec as P
    from tpu_reid.parallel.mesh import shard_map_nocheck

    from tpu_reid.models.layers import attention_impl

    def step_local(params, images_u8, *cv):
        # inside shard_map shapes are per-device -> fused kernels are safe
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        with attention_impl(impl):
            return step(params, images_u8, *cv)

    n_batch_args = 2 if with_cv_ids else 1
    sharded = shard_map_nocheck(
        step_local, mesh=mesh,
        in_specs=(P(),) + (P("data"),) * n_batch_args,
        out_specs=P("data"),
    )
    return jax.jit(sharded)


def make_scan_extractor(
    embed_fn: Callable[..., jax.Array],
    preprocess: DevicePreprocess,
    flip_tta: bool = True,
    dtype=jnp.bfloat16,
    fold=None,
):
    """Multi-batch extractor: ONE jitted program over K stacked batches.

    fn(params, images_u8) with images_u8 (K, B, H, W, 3) -> (K, B, E).
    A lax.scan over the leading axis runs K sequential encoder sweeps per
    dispatch, amortizing per-dispatch overhead K-fold — through a remote
    device link (the axon tunnel) each dispatch costs ~25-30 ms, which at
    K=1 taxes a ~125 ms batch by ~20%. Semantics are identical to calling
    make_extractor's step on each batch (same fused kernels: the scan body
    sees per-device static shapes). fold: see make_extractor (applied once
    per program, outside the scan)."""

    def one(params, images_u8):
        pre = preprocess.eval_batch_raw if fold is not None \
            else preprocess.eval_batch
        x = pre(images_u8).astype(dtype)
        feats = embed_fn(params, x)
        if flip_tta:
            feats = (feats + embed_fn(params, x[:, :, ::-1])) * 0.5
        return feats.astype(jnp.float32)

    @jax.jit
    def scan_fn(params, images_kb):
        if fold is not None:
            params = fold(params)

        def body(carry, im):
            return carry, one(params, im)

        _, out = jax.lax.scan(body, jnp.int32(0), images_kb)
        return out

    return scan_fn


def extract_embeddings(
    extractor,
    params: dict,
    batches: Iterable,
    mesh: Optional[Mesh] = None,
    hang_timeout_s: float = 600.0,
    on_hang=None,
    replicate_params: bool = True,
    cv_ids_of=None,
) -> Tuple[jax.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Sweep a loader; returns (features_on_device, pids, camids, seqids).

    batches yield objects with .images (B, H, W, 3) uint8 (fixed B), .pids,
    .camids, .seqids, .valid. Features stay in HBM; metadata is host-side.
    cv_ids_of(batch) -> (B,) int ids feeds the extractor's third argument
    (pair with make_extractor(with_cv_ids=True) — the SIE path; e.g.
    `lambda b: b.camids`, or a camera-x-viewpoint composition).

    hang_timeout_s: a StepWatchdog (runtime/guard.py) arms around every
    device dispatch — a wedged chip presents as a silently blocked host
    thread (observed failure mode), and the watchdog turns it into a
    recorded event / on_hang callback.
    """
    from tpu_reid.runtime.guard import StepWatchdog
    # commit params to device ONCE — numpy leaves passed to a jitted call
    # re-upload on EVERY invocation (catastrophic over slow links)
    params = jax.tree.map(jnp.asarray, params)
    if mesh is not None and replicate_params:
        # replicate_params=False: the caller pre-placed params with its own
        # shardings (tensor-parallel layouts, parallel/tp.py)
        from tpu_reid.parallel.mesh import replicated

        params = jax.device_put(params, replicated(mesh))
    feats = []
    pids, camids, seqids = [], [], []
    put = (lambda x: jax.device_put(x, data_sharding(mesh))) if mesh else jnp.asarray
    for b in batches:
        extra = (
            (put(np.asarray(cv_ids_of(b), np.int32)),)
            if cv_ids_of is not None else ()
        )
        with StepWatchdog(hang_timeout_s, on_hang=on_hang):
            f = extractor(params, put(b.images), *extra)
        if b.valid.all():
            feats.append(f)
            pids.append(b.pids)
            camids.append(b.camids)
            seqids.append(b.seqids)
        else:
            v = np.asarray(b.valid)
            feats.append(np.asarray(f)[v])
            pids.append(b.pids[v])
            camids.append(b.camids[v])
            seqids.append(b.seqids[v])
    return (
        jnp.concatenate([jnp.asarray(f) for f in feats], axis=0),
        np.concatenate(pids),
        np.concatenate(camids),
        np.concatenate(seqids),
    )
