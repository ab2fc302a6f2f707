"""Two-stage prompt-learning trainers.

Stage 1 (reference: prompt_learning.py:355-476) — learn text prompts:
  * coop/adapter: image features are precomputed ONCE with the frozen
    encoder, then every step only runs the text side against cached
    features (reference: :365-382, :434-444),
  * ivlp/promptsrc: VPT tokens change the image encoder, so image features
    are recomputed live each step (reference: :427-433),
  * loss = SupCon(i2t) + SupCon(t2i), Adam lr 3.5e-4 wd 1e-4, cosine
    schedule with 5-epoch warmup, PromptSRC keeps a gaussian-weighted
    parameter average (GPA mu=60 sigma=45).

Stage 2 (reference: prompt_learning.py:479-595) — fine-tune the image tower:
  * text features for all classes precomputed once with frozen prompts,
  * loss = 0.25*smoothCE(id logits) per head + smoothCE(proj @ text.T)
    + triplet(margin 0.3) on all three feature levels
    (+ SmoothL1 vs the frozen ZS tower for promptsrc),
  * Adam lr 5e-6 (bias x2) wd 1e-4, WarmupMultiStepLR([30,50], warmup 10),
  * GPA mu=30 sigma=30 for promptsrc.

Steps are pure jitted functions over (trainable, frozen) param partitions;
epoch loops live on host and drive the lr through inject_hyperparams.
GPA divergence (documented per SURVEY.md §7): the reference swaps the
average in at the SECOND-TO-LAST epoch (`epoch == epochs-1` with 1-based
epochs, :468); we swap at the end of training.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_reid.models import reid_clip as M
from tpu_reid.train import losses as L
from tpu_reid.train import optim as O
from tpu_reid.train import schedules as S


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs_stage1: int = 120
    epochs_stage2: int = 60
    lr_stage1: float = 3.5e-4
    lr_stage2: float = 5e-6
    weight_decay: float = 1e-4
    triplet_margin: float = 0.3
    id_loss_weight: float = 0.25
    label_smooth_eps: float = 0.1
    gpa_stage1: Tuple[float, float] = (60.0, 45.0)
    gpa_stage2: Tuple[float, float] = (30.0, 30.0)


def smooth_l1(x: jax.Array, y: jax.Array, valid=None) -> jax.Array:
    """torch F.smooth_l1_loss(beta=1, mean) for the promptsrc distill term
    (reference: prompt_learning.py:490). valid: optional (B,) row mask."""
    d = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))
    e = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    if valid is None:
        return jnp.mean(e)
    w = valid.astype(jnp.float32)[:, None]
    return jnp.sum(e * w) / jnp.maximum(jnp.sum(w) * e.shape[-1], 1.0)


# ---------------------------------------------------------------------------
# stage 1
# ---------------------------------------------------------------------------


def sharded_encoder(cfg: M.ReidModelConfig, mesh, fn):
    """shard_map-wrap an image-encode function for multi-chip training.

    Inside shard_map every device sees its LOCAL batch shard with concrete
    local shapes, which is what lets the fused Pallas kernels run (they do
    not auto-partition under plain sharded jit — models/layers._use_pallas
    disables them when device_count > 1). Params are replicated, the batch
    axis is sharded over "data", and the outputs come back sharded the
    same way, so the caller's loss still sees the full GLOBAL batch:
    BN statistics and triplet/SupCon mining keep single-chip semantics
    while XLA inserts the collectives (VERDICT r1 #4; the reference's
    mining is batch-global, losses.py:31-83).

    shard_map is differentiable — the backward pass recomputes each block
    via the XLA path per device (models/layers._block_fused_bwd) and grads
    of replicated params are psum'd by the partitioner."""
    from tpu_reid.parallel.mesh import shard_map_nocheck
    from jax.sharding import PartitionSpec as P

    from tpu_reid.models.layers import attention_impl

    # cv_ids (SIE camera ids) thread through only when the config carries
    # them — the multitask configs (and their 3-arg encode fns) don't
    uses_sie = getattr(cfg, "sie_ids", 0) > 0

    if uses_sie:
        def local(params, images, cv_ids):
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
            with attention_impl(impl):
                return fn(params, cfg, images, cv_ids)

        wrapped = shard_map_nocheck(
            local, mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=P("data"),
        )

        def call(params, _cfg, images, cv_ids=None):
            assert cv_ids is not None, "SIE training needs camera ids"
            return wrapped(params, images, cv_ids)

        return call

    def local(params, images):
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        with attention_impl(impl):
            return fn(params, cfg, images)

    wrapped = shard_map_nocheck(
        local, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"),
    )
    return lambda params, _cfg, images, cv_ids=None: wrapped(params, images)


def stage1_opt_state_template(params, cfg: M.ReidModelConfig,
                              tcfg: "TrainConfig"):
    """Freshly-initialized stage-1 optimizer state with the exact pytree
    structure run_stage1 uses — optax states are namedtuples, so restoring
    a checkpointed opt_state needs this as the template."""
    trainable, _ = O.partition(params, lambda p: M.stage1_trainable(p, cfg))
    return O.make_stage_optimizer(
        tcfg.lr_stage1, tcfg.weight_decay
    ).init(trainable)


def stage2_opt_state_template(params, cfg: M.ReidModelConfig,
                              tcfg: "TrainConfig"):
    trainable, _ = O.partition(params, lambda p: M.stage2_trainable(p, cfg))
    return O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    ).init(trainable)


def _as_device_array(x):
    """Batch leaf -> jax array WITHOUT a device round-trip for leaves that
    are already on device (a committed/sharded array pulled through
    np.asarray would block on a device-to-host fetch every step)."""
    if isinstance(x, jax.Array):
        return x
    return jnp.asarray(np.asarray(x))


def _is_multihost(mesh) -> bool:
    """True when the mesh spans more than one process (multi-host run)."""
    return mesh is not None and jax.process_count() > 1


def _commit_state(mesh, tree):
    """Commit params / optimizer state to device once. Multi-process mesh:
    replicate onto every device of every host (each process passes its own
    identical copy — converters and seeded inits are deterministic)."""
    if _is_multihost(mesh):
        from tpu_reid.parallel.multihost import replicate_multihost

        return replicate_multihost(mesh, tree)
    return jax.tree.map(jnp.asarray, tree)


def _batch_placer(mesh):
    """Batch-arg placement for the mesh path: jit's in_shardings refuse
    committed arrays whose sharding disagrees (a cached-feature slice or a
    preprocessed batch lands replicated / on one device), so the run loops
    device_put every batch leaf onto the "data" axis explicitly — a no-op
    when already placed there.

    Multi-host meshes can't device_put host values onto other processes'
    devices; instead every process contributes its own contiguous row
    slice of the (identical, deterministically generated) global batch via
    make_array_from_process_local_data. Each host re-generates the full
    batch and keeps rows/P — the trade that keeps trajectories EXACTLY
    equal to the single-process mesh (same batches, same augmentation
    keys); per-host input pipelines are the extraction sweep's job
    (parallel/multihost.py), training batches are small."""
    if mesh is None:
        return lambda b: b
    if _is_multihost(mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        dat = NamedSharding(mesh, P("data"))
        pid, pcount = jax.process_index(), jax.process_count()

        def place_leaf(x):
            x = np.asarray(x)
            per, rem = divmod(x.shape[0], pcount)
            assert rem == 0, (
                f"global batch {x.shape[0]} must divide by the "
                f"{pcount} processes"
            )
            return jax.make_array_from_process_local_data(
                dat, x[pid * per : (pid + 1) * per]
            )

        return lambda b: jax.tree.map(place_leaf, b)
    from tpu_reid.parallel.mesh import data_sharding

    dat = data_sharding(mesh)
    return lambda b: jax.device_put(b, dat)


def _jit_step(step, mesh, n_state: int, n_batch: int):
    """jit with mesh shardings: the first n_state args replicated (params /
    opt state), the remaining n_batch batch args sharded over "data". XLA
    derives the gradient psum from the shardings — jax.jit is the SPMD
    launcher, no pmap/NCCL analog."""
    if mesh is None:
        return jax.jit(step)
    from tpu_reid.parallel.mesh import data_sharding, replicated

    rep, dat = replicated(mesh), data_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep,) * n_state + (dat,) * n_batch,
    )


class LossPipeline:
    """Lag-1 loss resolution: step N's scalar loss is fetched only after
    step N+1 has been dispatched, so the host->device round-trip (25-30 ms
    through a remote tunnel) hides under the next step's execution instead
    of serializing the loop. Paired with parallel.prefetch.device_prefetch
    this keeps the chip saturated: transfers and preprocess for batch N+1
    enqueue while step N runs, and the loss fetch never stalls dispatch
    (VERDICT r2 #2; the reference only overlaps host decode,
    data_prepare.py:207).

    Guard semantics are preserved exactly: before a snapshot step, the
    pending loss is drained first, so a snapshot can never capture
    parameters whose producing step later turns out non-finite. On a
    rollback, the already-dispatched next step's output (computed from the
    poisoned state) is discarded along with its loss, matching the
    synchronous loop's skip-this-batch behavior.

    get_state() -> tuple / set_state(tuple) close over the caller's live
    state variables (trainable, [frozen,] opt_state, ...).
    """

    def __init__(self, guard, get_state, set_state):
        self.guard = guard
        self.get_state = get_state
        self.set_state = set_state
        self.losses: list = []
        self._pending = None

    def before_step(self, gstep: int):
        if self.guard is not None:
            if self._pending is not None and self.guard.will_snapshot(gstep):
                self._resolve()
            self.guard.maybe_snapshot(gstep, *self.get_state())

    def after_step(self, loss, redo=None):
        """Call right after dispatching a step. `redo()` re-executes that
        same step from the caller's (possibly rolled-back) state and
        returns its loss — invoked when the LAGGED loss turns out
        non-finite, so the just-dispatched step (whose input state was
        poisoned) is replayed instead of lost, reproducing the synchronous
        loop's semantics exactly: the diverged batch is skipped, the next
        batch is consumed from the restored state."""
        if self._pending is not None and not self._resolve():
            loss = redo() if redo is not None else None
        self._pending = loss

    def _resolve(self) -> bool:
        lf = float(self._pending)
        self._pending = None
        if self.guard is not None:
            state, ok = self.guard.check(lf, *self.get_state())
            if not ok:
                self.set_state(state)
                return False
        self.losses.append(lf)
        return True

    def drain_epoch(self) -> list:
        """Resolve the in-flight loss and hand back (and reset) the epoch's
        losses — call before any epoch-boundary consumer of the state
        (GPA update, checkpoint_cb, logging)."""
        if self._pending is not None:
            self._resolve()
        out = self.losses
        self.losses = []
        return out


def make_stage1_step(cfg: M.ReidModelConfig, optimizer, cached: bool,
                     mesh=None):
    """Jitted stage-1 step. cached=True: batch carries precomputed image
    features; cached=False (ivlp/promptsrc): batch carries images and the
    (live) encoder runs inside the step. mesh: shard the batch over "data"
    with replicated params."""

    encode = (
        sharded_encoder(cfg, mesh, M.encode_image_features)
        if (mesh is not None and not cached)
        else None
    )

    def loss_fn(trainable, frozen, batch):
        params = O.combine(trainable, frozen)
        labels = batch["labels"]
        valid = batch.get("valid")  # (B,) bool; padded rows drop out of both
        # supcon directions (the cached path host-filters instead)
        if cached:
            image_features = batch["image_features"]
        elif encode is not None:
            image_features = encode(
                params, cfg, batch["images"], batch.get("cv_ids")
            )["proj"]
        else:
            image_features = M.encode_image_features(
                params, cfg, batch["images"], batch.get("cv_ids")
            )["proj"]
        text_features = M.encode_text_features(params, cfg, labels)
        loss = L.supcon_loss(image_features, text_features, labels, labels,
                             anchor_valid=valid, contrast_valid=valid)
        loss += L.supcon_loss(text_features, image_features, labels, labels,
                              anchor_valid=valid, contrast_valid=valid)
        return loss

    def step(trainable, frozen, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return _jit_step(step, mesh, n_state=3, n_batch=1)


def precompute_image_features(
    params: dict,
    cfg: M.ReidModelConfig,
    batches: Iterable,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frozen-encoder sweep caching proj features for the coop/adapter fast
    path (reference: prompt_learning.py:365-382). Stays in HBM. Batches may
    carry a 4th element (camera ids) — applied through the SIE embedding at
    its frozen initial values, as CLIP-ReID's stage 1 does.

    mesh (multi-process only): shard the sweep's batch over "data" across
    all hosts' devices and gather features replicated, so the cached bank
    is a global array every later step can consume."""
    fn = lambda p, im, cv: M.encode_image_features(p, cfg, im, cv)["proj"]  # noqa: E731
    if _is_multihost(mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep, dat = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
        encode = jax.jit(
            fn, in_shardings=(rep, dat, dat), out_shardings=rep
        )
        place = _batch_placer(mesh)
    else:
        encode = jax.jit(fn)
        place = lambda b: b  # noqa: E731
    feats, labels = [], []
    for images, lab, valid, *rest in batches:
        cv = rest[0] if rest else None
        images, cv = place((images, cv))
        f = encode(params, images, cv)
        feats.append(f[np.asarray(valid)])
        labels.append(np.asarray(lab)[np.asarray(valid)])
    return jnp.concatenate(feats), jnp.asarray(np.concatenate(labels))


def run_stage1(
    params: dict,
    cfg: M.ReidModelConfig,
    tcfg: TrainConfig,
    epoch_batches: Callable[[int], Iterable],
    epochs: Optional[int] = None,
    seed: int = 0,
    mesh=None,
    batch_size: int = 64,
    log: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, dict, dict], None]] = None,
    cached_order: Optional[Callable[[int, np.ndarray], Iterable]] = None,
    guard=None,
    start_epoch: int = 1,
    init_opt_state=None,
    init_gpa=None,
) -> dict:
    """epoch_batches(epoch) yields (images_u8 or images, labels, valid)
    device-ready batches. batch_size drives the cached-feature path's step
    size (the reference uses params.bs, prompt_learning.py:379). Returns
    trained params (GPA-averaged for promptsrc). checkpoint_cb(epoch,
    params, state) fires after every epoch with state = {"opt_state", "gpa"}
    — wire CheckpointManager.maybe_save for the reference's every-20-epochs
    cadence (prompt_learning.py:472-474). start_epoch/init_opt_state/
    init_gpa resume a run mid-stage with the exact optimization trajectory
    (the reference cannot resume at all, SURVEY.md §5).

    cached_order(epoch, labels) -> iterable of index arrays overrides the
    cached path's batch order (the soft-multitask per-dataset alternation,
    reference: prompt_learning_multitask.py:475-503); tail batches shorter
    than batch_size are padded and masked."""
    epochs = epochs or tcfg.epochs_stage1
    params = _commit_state(mesh, params)  # commit to device once
    cached = cfg.mode in ("coop", "adapter")
    trainable, frozen = O.partition(
        params, lambda path: M.stage1_trainable(path, cfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1, tcfg.weight_decay)
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    step = make_stage1_step(cfg, optimizer, cached, mesh=mesh)
    place = _batch_placer(mesh)

    if cached:
        feats, labels = precompute_image_features(
            params, cfg, epoch_batches(0),
            mesh=mesh if _is_multihost(mesh) else None,
        )
        n = labels.shape[0]
        rng = np.random.default_rng(seed)

    # chunked dispatch for the cached single-device path: `chunk` steps
    # per jitted lax.scan (feature gather + step in one program). The
    # cached stage-1 step computes only the text side (~ms), so per-step
    # host dispatch (~30 ms through a remote link) dominates the epoch
    # wall; chunking pays it once per 32 steps. Identical batches/order
    # to the per-step path (same rng permutation, same padded tail).
    chunk = 32
    run_chunked = cached and mesh is None

    if run_chunked:
        feats = jnp.asarray(feats)
        labels_dev = jnp.asarray(labels)

        @jax.jit
        def run_chunk1(trainable, opt_state, frozen, feats, labels_dev,
                       sel, valid):
            def body(carry, xs):
                tr, os_ = carry
                idx, v = xs
                batch = {
                    "image_features": jnp.take(feats, idx, axis=0),
                    "labels": jnp.take(labels_dev, idx, axis=0),
                    "valid": v,
                }

                def do(c):
                    tr_, os__ = c
                    tr_, os__, loss = step(tr_, frozen, os__, batch)
                    return (tr_, os__), loss

                def skip(c):
                    return c, jnp.float32(0.0)

                return jax.lax.cond(v.any(), do, skip, (tr, os_))

            (trainable, opt_state), losses = jax.lax.scan(
                body, (trainable, opt_state), (sel, valid)
            )
            return trainable, opt_state, losses

    def _get_state():
        return trainable, opt_state

    def _set_state(state):
        nonlocal trainable, opt_state
        trainable, opt_state = state

    pipe = LossPipeline(guard, _get_state, _set_state)
    from tpu_reid.parallel.prefetch import device_prefetch

    gw = O.gauss_weights(*tcfg.gpa_stage1, epochs)
    gpa = init_gpa
    bs = None
    gstep = 0
    for epoch in range(start_epoch, epochs + 1):
        lr = S.cosine_warmup_lr(epoch, tcfg.lr_stage1, epochs)
        opt_state = O.set_lr(opt_state, lr)
        if cached:
            if bs is None:
                bs = min(batch_size, n)
            if cached_order is not None:
                sels = cached_order(epoch, np.asarray(labels))
            else:
                order = rng.permutation(n)
                sels = (order[i : i + bs] for i in range(0, n, bs))

            if run_chunked:
                # materialize + pad the epoch's index rows, run `chunk`
                # steps per dispatch; guard at chunk granularity (same
                # replay-the-chunk semantics as run_stage2_cached)
                sel_rows, valid_rows = [], []
                for sel in sels:
                    sel = np.asarray(sel)
                    v = np.ones((bs,), bool)
                    if sel.shape[0] < bs:
                        v[sel.shape[0]:] = False
                        sel = np.concatenate(
                            [sel, np.zeros((bs - sel.shape[0],), sel.dtype)]
                        )
                    sel_rows.append(sel.astype(np.int32))
                    valid_rows.append(v)
                n_steps = len(sel_rows)
                pad = (-n_steps) % chunk
                sel_arr = np.stack(
                    sel_rows + [np.zeros((bs,), np.int32)] * pad
                )
                valid_arr = np.stack(
                    valid_rows + [np.zeros((bs,), bool)] * pad
                )
                losses_ep = []
                for lo in range(0, n_steps + pad, chunk):
                    if guard is not None:
                        guard.maybe_snapshot(gstep, trainable, opt_state)

                    def dispatch_chunk():
                        return run_chunk1(
                            trainable, opt_state, frozen, feats,
                            labels_dev,
                            jnp.asarray(sel_arr[lo:lo + chunk]),
                            jnp.asarray(valid_arr[lo:lo + chunk]),
                        )

                    tr2, os2, lvec = dispatch_chunk()
                    lh = np.asarray(lvec)
                    live = valid_arr[lo:lo + chunk].any(axis=1)
                    if guard is not None and not np.isfinite(
                        lh[live]
                    ).all():
                        (trainable, opt_state), _ = guard.check(
                            float(lh[live][~np.isfinite(lh[live])][0]),
                            trainable, opt_state,
                        )
                        tr2, os2, lvec = dispatch_chunk()
                        lh = np.asarray(lvec)
                    trainable, opt_state = tr2, os2
                    gstep += int(live.sum())
                    losses_ep.extend(lh[live][np.isfinite(lh[live])])
                if cfg.mode == "promptsrc":
                    gpa = O.gpa_update(
                        gpa, O.combine(trainable, frozen), gw[epoch - 1]
                    )
                if losses_ep:
                    log(
                        f"[stage1] epoch {epoch}/{epochs} "
                        f"loss {np.mean(losses_ep):.4f} lr {lr:.2e}"
                    )
                if checkpoint_cb is not None:
                    checkpoint_cb(epoch, O.combine(trainable, frozen),
                                  {"opt_state": opt_state, "gpa": gpa})
                continue

            def cached_batch(sel):
                sel = np.asarray(sel)
                k = sel.shape[0]
                valid = np.ones((bs,), bool)
                if k < bs:  # padded tail (the reference's ragged tail batch,
                    # prompt_learning.py:434-441) — masked out of the loss
                    valid[k:] = False
                    sel = np.concatenate([sel, np.zeros((bs - k,), sel.dtype)])
                return place({
                    "image_features": feats[sel],
                    "labels": labels[sel],
                    "valid": jnp.asarray(valid),
                })

            batches = device_prefetch(sels, cached_batch)
        else:
            def live_batch(item):
                images, lab, valid, *rest = item
                batch = {
                    "images": images,
                    "labels": lab,
                    "valid": _as_device_array(valid),
                }
                if rest:  # camera ids for SIE
                    batch["cv_ids"] = _as_device_array(rest[0])
                return place(batch)

            batches = device_prefetch(epoch_batches(epoch), live_batch)
        for batch in batches:
            pipe.before_step(gstep)

            def dispatch(batch=batch):
                nonlocal trainable, opt_state
                trainable, opt_state, loss = step(
                    trainable, frozen, opt_state, batch
                )
                return loss

            gstep += 1
            pipe.after_step(dispatch(), redo=dispatch)
        losses = pipe.drain_epoch()
        if cfg.mode == "promptsrc":
            gpa = O.gpa_update(
                gpa, O.combine(trainable, frozen), gw[epoch - 1]
            )
        if losses:
            log(
                f"[stage1] epoch {epoch}/{epochs} "
                f"loss {np.mean(losses):.4f} lr {lr:.2e}"
            )
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa})
    out = O.combine(trainable, frozen)
    if cfg.mode == "promptsrc" and gpa is not None:
        out = gpa
    return out


# ---------------------------------------------------------------------------
# stage 2
# ---------------------------------------------------------------------------


def make_stage2_step(
    cfg: M.ReidModelConfig, tcfg: TrainConfig, optimizer, mesh=None
):
    encode = (
        sharded_encoder(cfg, mesh, M.encode_train_features)
        if mesh is not None else None
    )

    def loss_fn(trainable, frozen, images, labels, text_features, valid,
                cv_ids):
        params = O.combine(trainable, frozen)
        out = M.forward_train(params, cfg, images, train=True, valid=valid,
                              encode_fn=encode, cv_ids=cv_ids)
        loss = jnp.float32(0.0)
        if cfg.mode == "promptsrc":
            loss += smooth_l1(out["features"][1], out["zs_non_proj"], valid)
        for score in out["cls_scores"]:
            loss += tcfg.id_loss_weight * L.cross_entropy_label_smooth(
                score, labels, tcfg.label_smooth_eps, valid=valid
            )
        logits = out["proj"].astype(jnp.float32) @ text_features.T.astype(
            jnp.float32
        )
        loss += L.cross_entropy_label_smooth(
            logits, labels, tcfg.label_smooth_eps, valid=valid
        )
        tri = jnp.float32(0.0)
        for feat in out["features"]:
            tri += L.triplet_loss(
                feat, labels, margin=tcfg.triplet_margin, valid=valid
            )
        if valid is None:
            loss += tri
        else:
            # reference multitask gates the triplet on batch size >= 4
            # (prompt_learning_multitask.py:565-568); a padded tail batch
            # with <4 real rows has no meaningful hard mining
            loss += jnp.where(jnp.sum(valid) >= 4, tri, 0.0)
        return loss, out["bn_stats"]

    def step(trainable, frozen, opt_state, images, labels, text_features,
             valid=None, cv_ids=None):
        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, images, labels, text_features, valid, cv_ids
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        # thread the BNNeck running stats (state lives in the frozen tree)
        frozen = dict(frozen)
        frozen["head"] = dict(frozen["head"])
        for name in ("bn", "bn_proj"):
            stats = bn_stats[name]
            if stats is not None:
                frozen["head"][name] = dict(frozen["head"][name])
                frozen["head"][name]["mean"] = stats["mean"]
                frozen["head"][name]["var"] = stats["var"]
        jpm_stats = bn_stats.get("jpm")
        if jpm_stats is not None:  # use_jpm: 4th BNNeck on the jigsaw branch
            frozen["jpm_head"] = dict(frozen["jpm_head"])
            frozen["jpm_head"]["bn"] = dict(
                frozen["jpm_head"]["bn"],
                mean=jpm_stats["mean"], var=jpm_stats["var"],
            )
        return trainable, frozen, opt_state, loss

    if mesh is None:
        return jax.jit(step)
    from tpu_reid.parallel.mesh import data_sharding, replicated

    rep, dat = replicated(mesh), data_sharding(mesh)
    # params/opt state/text features replicated; image/label/valid (and the
    # SIE camera ids, when configured) sharded. the mesh path requires
    # valid to be passed (an explicit all-ones mask for full batches) so
    # the arity matches the shardings.
    shardings = (rep, rep, rep, dat, dat, rep, dat)
    if cfg.sie_ids > 0:
        shardings = shardings + (dat,)
    return jax.jit(step, in_shardings=shardings)


def run_stage2(
    params: dict,
    cfg: M.ReidModelConfig,
    tcfg: TrainConfig,
    epoch_batches: Callable[[int], Iterable],
    epochs: Optional[int] = None,
    mesh=None,
    log: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, dict, dict], None]] = None,
    guard=None,
    start_epoch: int = 0,
    init_opt_state=None,
    init_gpa=None,
) -> dict:
    """guard: optional runtime.guard.TrainGuard — snapshots
    (trainable, frozen, opt_state) periodically and rolls all three back
    when a step yields a non-finite loss (frozen carries the BNNeck
    running stats, which a diverged step also poisons)."""
    epochs = epochs or tcfg.epochs_stage2
    params = _commit_state(mesh, params)  # commit to device once
    text_features = jax.lax.stop_gradient(
        M.all_class_text_features(params, cfg)
    )
    trainable, frozen = O.partition(
        params, lambda path: M.stage2_trainable(path, cfg)
    )
    optimizer = O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    )
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    step = make_stage2_step(cfg, tcfg, optimizer, mesh=mesh)
    place = _batch_placer(mesh)

    def _get_state():
        return trainable, frozen, opt_state

    def _set_state(state):
        nonlocal trainable, frozen, opt_state
        trainable, frozen, opt_state = state

    pipe = LossPipeline(guard, _get_state, _set_state)
    from tpu_reid.parallel.prefetch import device_prefetch

    def place_batch(item):
        images, labels, valid, *rest = item
        extra = ()
        if cfg.sie_ids > 0:  # camera ids ride as a trailing element
            assert rest, "sie_ids > 0: batches must carry camera ids"
            extra = (_as_device_array(rest[0]),)
        return place((images, labels, _as_device_array(valid)) + extra)

    gw = O.gauss_weights(*tcfg.gpa_stage2, epochs)
    gpa = init_gpa
    gstep = 0
    for epoch in range(start_epoch, epochs):
        lr = S.warmup_multistep_lr(epoch, tcfg.lr_stage2)
        opt_state = O.set_lr(opt_state, lr)
        for images, labels, valid, *extra in device_prefetch(
            epoch_batches(epoch), place_batch
        ):
            pipe.before_step(gstep)

            def dispatch(images=images, labels=labels, valid=valid,
                         extra=tuple(extra)):
                nonlocal trainable, frozen, opt_state
                trainable, frozen, opt_state, loss = step(
                    trainable, frozen, opt_state, images, labels,
                    text_features, valid, *extra,
                )
                return loss

            gstep += 1
            pipe.after_step(dispatch(), redo=dispatch)
        losses = pipe.drain_epoch()
        if cfg.mode == "promptsrc":
            gpa = O.gpa_update(gpa, O.combine(trainable, frozen), gw[epoch])
        if losses:
            log(
                f"[stage2] epoch {epoch + 1}/{epochs} "
                f"loss {np.mean(losses):.4f} lr {lr:.2e}"
            )
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa})
    out = O.combine(trainable, frozen)
    if cfg.mode == "promptsrc" and gpa is not None:
        out = gpa
    return out


def run_stage2_cached(
    params: dict,
    cfg: M.ReidModelConfig,
    tcfg: TrainConfig,
    cache,
    order_of_epoch: Callable[[int], Iterable],
    pp,
    epoch_key,
    epochs: Optional[int] = None,
    pad_hw: Tuple[int, int] = (10, 10),
    log: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, dict, dict], None]] = None,
    guard=None,
    start_epoch: int = 0,
    init_opt_state=None,
    init_gpa=None,
    chunk: int = 32,
) -> dict:
    """Stage 2 served entirely from a DeviceImageCache, `chunk` steps per
    dispatch.

    With the train split HBM-resident, a step's only host inputs are a
    (B,) index row and metadata — so the gather, the fused train
    transform AND the train step run inside ONE jitted lax.scan over
    `chunk` steps. Through a remote device link the per-step host cost
    (~5 dispatches x ~30 ms: gather, transform, fold_in, step, loss
    fetch) dominated the 90 ms step compute (measured ~200 s/epoch vs
    ~18 s compute at Market scale, r5); chunking pays one dispatch + one
    (chunk,) loss fetch per `chunk` steps instead.

    Bit-identical math to the per-step cached path: same jnp.take
    gather, same fold_in(epoch_key, global_step) RNG stream, same
    make_stage2_step body, same BNNeck-stats threading. Tail steps
    beyond the epoch's batch count are padded with valid=False rows and
    skipped via lax.cond (no state update, loss masked out host-side).

    order_of_epoch(epoch) -> iterator of (sel, pids, camids, valid)
    (DeviceImageCache.epoch_index_batches). Single-device path: callers
    with a mesh or SIE ids use run_stage2 (the host loop).

    Guard semantics: snapshot before each chunk, losses checked after
    each chunk's single fetch; a non-finite loss inside a chunk rolls
    back to the pre-chunk snapshot and re-runs that chunk once (the
    diverged batch is then skipped by the finite-loss mask, matching the
    synchronous loop's skip-this-batch behavior at chunk granularity).
    """
    epochs = epochs or tcfg.epochs_stage2
    params = jax.tree.map(jnp.asarray, params)
    text_features = jax.lax.stop_gradient(
        M.all_class_text_features(params, cfg)
    )
    trainable, frozen = O.partition(
        params, lambda path: M.stage2_trainable(path, cfg)
    )
    optimizer = O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    )
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    step = make_stage2_step(cfg, tcfg, optimizer)

    @jax.jit
    def run_chunk(trainable, frozen, opt_state, images, sel, pids, valid,
                  i0, key, text_features):
        def body(carry, xs):
            tr, fr, os_ = carry
            idx, labels, v, i = xs
            imgs = pp.train_batch(
                jnp.take(images, idx, axis=0),
                jax.random.fold_in(key, i),
                pad_hw=pad_hw,
            )

            def do(c):
                tr_, fr_, os__ = c
                tr_, fr_, os__, loss = step(
                    tr_, fr_, os__, imgs, labels, text_features, v
                )
                return (tr_, fr_, os__), loss

            def skip(c):
                return c, jnp.float32(0.0)

            carry, loss = jax.lax.cond(v.any(), do, skip, (tr, fr, os_))
            return carry, loss

        steps_i = i0 + jnp.arange(sel.shape[0])
        (trainable, frozen, opt_state), losses = jax.lax.scan(
            body, (trainable, frozen, opt_state),
            (sel, pids, valid, steps_i),
        )
        return trainable, frozen, opt_state, losses

    gw = O.gauss_weights(*tcfg.gpa_stage2, epochs)
    gpa = init_gpa
    for epoch in range(start_epoch, epochs):
        lr = S.warmup_multistep_lr(epoch, tcfg.lr_stage2)
        opt_state = O.set_lr(opt_state, lr)
        batches = list(order_of_epoch(epoch))
        sel = np.stack([b[0] for b in batches])
        pids = np.stack([b[1] for b in batches])
        valid = np.stack([b[3] for b in batches])
        n_steps = len(batches)
        pad = (-n_steps) % chunk
        if pad:
            sel = np.concatenate([sel, np.zeros((pad,) + sel.shape[1:],
                                                sel.dtype)])
            pids = np.concatenate([pids, np.zeros((pad,) + pids.shape[1:],
                                                  pids.dtype)])
            valid = np.concatenate(
                [valid, np.zeros((pad,) + valid.shape[1:], bool)]
            )
        k = jax.random.fold_in(epoch_key, 10_000 + epoch)
        losses_all = []
        for ci, lo in enumerate(range(0, n_steps + pad, chunk)):
            gstep = epoch * (n_steps + pad) + lo
            if guard is not None:
                guard.maybe_snapshot(gstep, trainable, frozen, opt_state)

            def dispatch():
                return run_chunk(
                    trainable, frozen, opt_state, cache.images,
                    jnp.asarray(sel[lo:lo + chunk]),
                    jnp.asarray(pids[lo:lo + chunk]),
                    jnp.asarray(valid[lo:lo + chunk]),
                    jnp.int32(lo), k, text_features,
                )

            tr2, fr2, os2, losses = dispatch()
            lh = np.asarray(losses)
            step_live = valid[lo:lo + chunk].any(axis=1)
            if guard is not None and not np.isfinite(lh[step_live]).all():
                (trainable, frozen, opt_state), _ = guard.check(
                    float(lh[step_live][~np.isfinite(lh[step_live])][0]),
                    trainable, frozen, opt_state,
                )
                tr2, fr2, os2, losses = dispatch()
                lh = np.asarray(losses)
            trainable, frozen, opt_state = tr2, fr2, os2
            losses_all.extend(lh[step_live][np.isfinite(lh[step_live])])
        if cfg.mode == "promptsrc":
            gpa = O.gpa_update(gpa, O.combine(trainable, frozen), gw[epoch])
        if losses_all:
            log(
                f"[stage2] epoch {epoch + 1}/{epochs} "
                f"loss {np.mean(losses_all):.4f} lr {lr:.2e}"
            )
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa})
    out = O.combine(trainable, frozen)
    if cfg.mode == "promptsrc" and gpa is not None:
        out = gpa
    return out


def run_stage1_live_cached(
    params: dict,
    cfg: M.ReidModelConfig,
    tcfg: TrainConfig,
    cache,
    order_of_epoch: Callable[[int], Iterable],
    pp,
    epochs: Optional[int] = None,
    log: Callable[[str], None] = print,
    checkpoint_cb: Optional[Callable[[int, dict, dict], None]] = None,
    guard=None,
    start_epoch: int = 1,
    init_opt_state=None,
    init_gpa=None,
    chunk: int = 32,
) -> dict:
    """Live stage 1 (ivlp/promptsrc/maple — VPT tokens change the image
    encoder, so features recompute every step) served from a
    DeviceImageCache, `chunk` steps per jitted lax.scan: image gather +
    deterministic eval transform + live step in one program. Same
    batches/order as the per-step cached CLI path (reference stage 1
    consumes the val-transform loader, prompt_learning.py:708-710).
    Single-device path; guard at chunk granularity (replay-the-chunk,
    as run_stage2_cached)."""
    epochs = epochs or tcfg.epochs_stage1
    params = jax.tree.map(jnp.asarray, params)
    trainable, frozen = O.partition(
        params, lambda path: M.stage1_trainable(path, cfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1, tcfg.weight_decay)
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    step = make_stage1_step(cfg, optimizer, cached=False)

    @jax.jit
    def run_chunk(trainable, opt_state, frozen, images, sel, pids, valid):
        def body(carry, xs):
            tr, os_ = carry
            idx, labels, v = xs
            batch = {
                "images": pp.eval_batch(jnp.take(images, idx, axis=0)),
                "labels": labels,
                "valid": v,
            }

            def do(c):
                tr_, os__ = c
                tr_, os__, loss = step(tr_, frozen, os__, batch)
                return (tr_, os__), loss

            def skip(c):
                return c, jnp.float32(0.0)

            return jax.lax.cond(v.any(), do, skip, (tr, os_))

        (trainable, opt_state), losses = jax.lax.scan(
            body, (trainable, opt_state), (sel, pids, valid)
        )
        return trainable, opt_state, losses

    gw = O.gauss_weights(*tcfg.gpa_stage1, epochs)
    gpa = init_gpa
    gstep = 0
    for epoch in range(start_epoch, epochs + 1):
        lr = S.cosine_warmup_lr(epoch, tcfg.lr_stage1, epochs)
        opt_state = O.set_lr(opt_state, lr)
        batches = list(order_of_epoch(epoch))
        sel = np.stack([b[0] for b in batches]).astype(np.int32)
        pids = np.stack([b[1] for b in batches]).astype(np.int32)
        valid = np.stack([b[3] for b in batches])
        n_steps = len(batches)
        pad = (-n_steps) % chunk
        if pad:
            sel = np.concatenate(
                [sel, np.zeros((pad,) + sel.shape[1:], sel.dtype)]
            )
            pids = np.concatenate(
                [pids, np.zeros((pad,) + pids.shape[1:], pids.dtype)]
            )
            valid = np.concatenate(
                [valid, np.zeros((pad,) + valid.shape[1:], bool)]
            )
        losses_ep = []
        for lo in range(0, n_steps + pad, chunk):
            if guard is not None:
                guard.maybe_snapshot(gstep, trainable, opt_state)

            def dispatch():
                return run_chunk(
                    trainable, opt_state, frozen, cache.images,
                    jnp.asarray(sel[lo:lo + chunk]),
                    jnp.asarray(pids[lo:lo + chunk]),
                    jnp.asarray(valid[lo:lo + chunk]),
                )

            tr2, os2, lvec = dispatch()
            lh = np.asarray(lvec)
            live = valid[lo:lo + chunk].any(axis=1)
            if guard is not None and not np.isfinite(lh[live]).all():
                (trainable, opt_state), _ = guard.check(
                    float(lh[live][~np.isfinite(lh[live])][0]),
                    trainable, opt_state,
                )
                tr2, os2, lvec = dispatch()
                lh = np.asarray(lvec)
            trainable, opt_state = tr2, os2
            gstep += int(live.sum())
            losses_ep.extend(lh[live][np.isfinite(lh[live])])
        if cfg.mode == "promptsrc":
            gpa = O.gpa_update(gpa, O.combine(trainable, frozen),
                               gw[epoch - 1])
        if losses_ep:
            log(
                f"[stage1] epoch {epoch}/{epochs} "
                f"loss {np.mean(losses_ep):.4f} lr {lr:.2e}"
            )
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa})
    out = O.combine(trainable, frozen)
    if cfg.mode == "promptsrc" and gpa is not None:
        out = gpa
    return out
