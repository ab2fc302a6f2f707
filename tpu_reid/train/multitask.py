"""Multitask prompt-learning across two datasets (person + person, or
person + vehicle).

Three reference variants (behavior, not code):
  * soft sharing (prompt_learning_multitask.py) — ONE model over
    n_cls1+n_cls2 merged classes; dataset 2's labels offset by n_cls1
    (:500, :643); stage 1 alternates batches between datasets, stage 2
    walks both loaders together. Implemented with data.datasets.
    merge_datasets + the single-task trainers + the `alternate` scheduler.
  * hard sharing (prompt_learning_multitask_hard_sharing.py) — shared CLIP
    trunk; per-dataset PromptLearner + Classifier heads; per-dataset XBM
    with 0.2-weighted memory triplet from epoch >= 10 (:611-618); GPA
    applied unconditionally in stage 2 (:668-677).
  * hard sharing IVLP (..._hard_sharing_ivlp.py) — additionally a SECOND
    text tower (a copy, with its own language VPT, :691-695) and optional
    per-dataset image resolutions (:619-620). A second positional
    embedding, bicubic-resized from the shared one, serves dataset 2's
    grid (divergence note: the reference feeds one pos-embed to both
    resolutions, which only runs when the resolutions coincide).

Every step alternates datasets and applies a separate optimizer update per
task batch (reference: :447-539), so each task keeps its own jitted step
with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_reid.configs import CLIPConfig
from tpu_reid.models import heads as H
from tpu_reid.models import prompts as P
from tpu_reid.models import text as T
from tpu_reid.models import vit as V
from tpu_reid.models.clip_model import resize_pos_embed
from tpu_reid.train import losses as L
from tpu_reid.train import optim as O
from tpu_reid.train import schedules as S
from tpu_reid.train import trainer as TR
from tpu_reid.train import xbm as X
from tpu_reid.train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class MultitaskModelConfig:
    variant: str  # "hard" | "hard_ivlp"
    clip: CLIPConfig  # dataset-1 geometry
    clip2: CLIPConfig  # dataset-2 geometry (may differ in grid only)
    prompt1: P.PromptLearnerConfig
    prompt2: P.PromptLearnerConfig

    def __post_init__(self):
        assert self.variant in ("hard", "hard_ivlp")

    @property
    def dual_text(self) -> bool:
        return self.variant == "hard_ivlp"


def init_multitask_model(
    key: jax.Array,
    cfg: MultitaskModelConfig,
    clip_params: dict,
    temb1, tok1, temb2, tok2,
) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    width = cfg.clip.vision.width
    params = {
        "clip": clip_params,
        "prompt1": P.init_prompt_learner(k1, cfg.prompt1, temb1, tok1),
        "prompt2": P.init_prompt_learner(k2, cfg.prompt2, temb2, tok2),
        "head1": H.init_classifier(
            k3, cfg.prompt1.n_cls, dim_nonproj=width,
            dim_proj=cfg.clip.embed_dim,
        ),
        "head2": H.init_classifier(
            k4, cfg.prompt2.n_cls, dim_nonproj=width,
            dim_proj=cfg.clip.embed_dim,
        ),
    }
    if cfg.dual_text:
        params["text2"] = jax.tree.map(jnp.array, clip_params["text"])
    g1 = (cfg.clip.vision.h_grid, cfg.clip.vision.w_grid)
    g2 = (cfg.clip2.vision.h_grid, cfg.clip2.vision.w_grid)
    if g2 != g1:
        params["pos_embed2"] = jnp.asarray(
            resize_pos_embed(
                np.asarray(clip_params["visual"]["positional_embedding"]),
                g2[0], g2[1], in_hw=g1,
            )
        )
    return params


def _visual_for_task(params: dict, cfg: MultitaskModelConfig, task: int):
    visual = params["clip"]["visual"]
    if task == 1 and "pos_embed2" in params:
        visual = dict(visual)
        visual["positional_embedding"] = params["pos_embed2"]
    return visual, (cfg.clip if task == 0 else cfg.clip2).vision


def encode_image_mt(params, cfg: MultitaskModelConfig, task: int, images):
    visual, vcfg = _visual_for_task(params, cfg, task)
    x11, x12, xproj = V.apply_vit(visual, vcfg, images, cls_only=True)
    return x11[:, 0], x12[:, 0], xproj[:, 0]


def encode_text_mt(params, cfg: MultitaskModelConfig, task: int, label):
    pl = params["prompt1"] if task == 0 else params["prompt2"]
    pcfg = cfg.prompt1 if task == 0 else cfg.prompt2
    text_params = (
        params["text2"] if (task == 1 and cfg.dual_text) else params["clip"]["text"]
    )
    prompts, eot = P.apply_prompt_learner(pl, pcfg, label)
    return T.encode_text_embeddings(text_params, cfg.clip.text, prompts, eot)


def all_class_text_features_mt(params, cfg, task: int) -> jax.Array:
    n = (cfg.prompt1 if task == 0 else cfg.prompt2).n_cls
    return encode_text_mt(params, cfg, task, jnp.arange(n))


def eval_embed_mt(params, cfg, task: int, images) -> jax.Array:
    _, non_proj, proj = encode_image_mt(params, cfg, task, images)
    return jnp.concatenate([non_proj, proj], axis=-1)


# ---------------------------------------------------------------------------
# trainable partitions
# ---------------------------------------------------------------------------


def mt_stage1_trainable(path: Tuple[str, ...], cfg: MultitaskModelConfig) -> bool:
    if path[0] in ("prompt1", "prompt2"):
        return path[-1] == "cls_ctx"
    if cfg.variant == "hard_ivlp" and any(p.startswith("vpt_") for p in path):
        return True
    return False


def mt_stage2_trainable(path: Tuple[str, ...], cfg: MultitaskModelConfig) -> bool:
    if path[0] in ("prompt1", "prompt2"):
        return False
    # text towers take no gradient in stage 2 (precomputed text features);
    # see reid_clip.stage2_trainable for the weight-decay rationale
    if path[0] == "text2" or (path[0] == "clip" and path[1] == "text"):
        return False
    if path[-1] == "logit_scale":
        return False
    if any(p.startswith("vpt_") for p in path):
        return False
    if path[0] in ("head1", "head2") and path[1] in ("bn", "bn_proj") and (
        path[-1] == "bias"
    ):
        return False
    if path[-1] in ("mean", "var"):
        return False
    return True


# ---------------------------------------------------------------------------
# steps
# ---------------------------------------------------------------------------


def _mt_sharded_encoder(cfg, mesh, task: int):
    """shard_map-wrapped per-task image encode (fused kernels run on the
    per-device local batch; losses keep global-batch semantics at the jit
    level — same design as trainer.sharded_encoder)."""
    from tpu_reid.train.trainer import sharded_encoder

    return sharded_encoder(
        cfg, mesh, lambda p, c, im: encode_image_mt(p, c, task, im)
    )


def _mt_jit(step, mesh, shardings):
    if mesh is None:
        return jax.jit(step)
    from tpu_reid.parallel.mesh import data_sharding, replicated

    rep, dat = replicated(mesh), data_sharding(mesh)
    table = {"r": rep, "d": dat}
    return jax.jit(step, in_shardings=tuple(table[c] for c in shardings))


def make_mt_stage1_step(cfg: MultitaskModelConfig, optimizer, task: int,
                        mesh=None):
    encode = _mt_sharded_encoder(cfg, mesh, task) if mesh is not None else None

    def loss_fn(trainable, frozen, images, labels, valid):
        params = O.combine(trainable, frozen)
        if encode is not None:
            image_features = encode(params, cfg, images)[2]
        else:
            image_features = encode_image_mt(params, cfg, task, images)[2]
        text_features = encode_text_mt(params, cfg, task, labels)
        return (
            L.supcon_loss(image_features, text_features, labels, labels,
                          anchor_valid=valid, contrast_valid=valid)
            + L.supcon_loss(text_features, image_features, labels, labels,
                            anchor_valid=valid, contrast_valid=valid)
        )

    def step(trainable, frozen, opt_state, images, labels, valid=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, frozen, images, labels, valid
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    # params/opt replicated, batch sharded over "data"
    return _mt_jit(step, mesh, "rrrddd")


def make_mt_stage2_step(
    cfg: MultitaskModelConfig, tcfg: TrainConfig, optimizer, task: int,
    xbm_weight: float = 0.2,
    mesh=None,
):
    head_key = "head1" if task == 0 else "head2"
    encode = _mt_sharded_encoder(cfg, mesh, task) if mesh is not None else None

    def loss_fn(trainable, frozen, images, labels, text_features, xbm_state,
                use_xbm, valid):
        params = O.combine(trainable, frozen)
        if encode is not None:
            last, non_proj, proj = encode(params, cfg, images)
        else:
            last, non_proj, proj = encode_image_mt(params, cfg, task, images)
        head = H.apply_classifier(params[head_key], non_proj, proj, train=True,
                                  valid=valid)
        loss = jnp.float32(0.0)
        for score in (head["logits"], head["logits_proj"]):
            loss += tcfg.id_loss_weight * L.cross_entropy_label_smooth(
                score, labels, tcfg.label_smooth_eps, valid=valid
            )
        logits = proj.astype(jnp.float32) @ text_features.T.astype(jnp.float32)
        loss += L.cross_entropy_label_smooth(
            logits, labels, tcfg.label_smooth_eps, valid=valid
        )
        tri = jnp.float32(0.0)
        for feat in (last, non_proj, proj):
            tri += L.triplet_loss(
                feat, labels, margin=tcfg.triplet_margin, valid=valid
            )
        if valid is None:
            loss += tri
        else:  # bs>=4 triplet gate (reference: ..._multitask.py:565-568)
            loss += jnp.where(jnp.sum(valid) >= 4, tri, 0.0)

        # XBM memory triplet (reference enqueues BEFORE mining, so the
        # current batch is part of the bank; self-slots are excluded).
        # margin 0.3: both hard-sharing scripts construct
        # WeightedRegularizedTripletXBM(0.3) (reference: ..._hard_sharing.py:574,
        # ..._hard_sharing_ivlp.py:436)
        new_xbm, slots = X.xbm_enqueue(xbm_state, proj, labels, valid=valid)
        bank_f, bank_l, bank_valid = X.xbm_get(new_xbm)
        xbm_loss = L.triplet_loss_xbm(
            proj, labels, bank_f, bank_l, margin=tcfg.triplet_margin,
            self_cols=slots, valid_cols=bank_valid, valid=valid,
        )
        loss += jnp.where(use_xbm, xbm_weight * xbm_loss, 0.0)
        return loss, (head["new_stats"], new_xbm)

    def step(trainable, frozen, opt_state, images, labels, text_features,
             xbm_state, use_xbm, valid=None):
        (loss, (bn_stats, new_xbm)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable, frozen, images, labels, text_features, xbm_state,
          use_xbm, valid)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        frozen = dict(frozen)
        frozen[head_key] = dict(frozen[head_key])
        for name in ("bn", "bn_proj"):
            stats = bn_stats[name]
            if stats is not None:
                frozen[head_key][name] = dict(frozen[head_key][name])
                frozen[head_key][name]["mean"] = stats["mean"]
                frozen[head_key][name]["var"] = stats["var"]
        return trainable, frozen, opt_state, new_xbm, loss

    # text features, XBM bank and the use_xbm flag are replicated; the
    # image/label/valid batch shards over "data"
    return _mt_jit(step, mesh, "rrrddrrrd")


# ---------------------------------------------------------------------------
# schedulers over two loaders
# ---------------------------------------------------------------------------


def alternate(it1: Iterable, it2: Iterable) -> Iterator[Tuple[int, object]]:
    """Strict 1:1 alternation until EITHER iterator is exhausted — the
    hard-sharing-ivlp `while i <= iter1 and j <= iter2` semantics
    (reference: ..._hard_sharing_ivlp.py:253)."""
    a, b = iter(it1), iter(it2)
    while True:
        try:
            yield 0, next(a)
            yield 1, next(b)
        except StopIteration:
            return


def alternate_longest(
    it1: Iterable, it2: Iterable
) -> Iterator[Tuple[int, object]]:
    """Alternation that drains BOTH iterators — after one is exhausted the
    other keeps going (the `while i <= iter1 or j <= iter2` toggle in the
    soft and plain-hard stage-1 loops, reference:
    prompt_learning_multitask.py:477, ..._hard_sharing.py:331)."""
    from itertools import zip_longest

    for b1, b2 in zip_longest(it1, it2):
        if b1 is not None:
            yield 0, b1
        if b2 is not None:
            yield 1, b2


def chain_tasks(it1: Iterable, it2: Iterable) -> Iterator[Tuple[int, object]]:
    """zip-style pairing: one batch from each per step pair, stopping at the
    shorter loader (reference hard-ivlp stage 2:
    ..._hard_sharing_ivlp.py:452 `zip(dataloader1, dataloader2)`)."""
    for b1, b2 in zip(it1, it2):
        yield 0, b1
        yield 1, b2


def chain_tasks_longest(
    it1: Iterable, it2: Iterable
) -> Iterator[Tuple[int, object]]:
    """zip_longest pairing: after the shorter loader drains, the longer one
    keeps stepping alone (reference plain-hard stage 2:
    ..._hard_sharing.py:592 `zip_longest(dataloader1, dataloader2)`)."""
    return alternate_longest(it1, it2)


# ---------------------------------------------------------------------------
# epoch loops
# ---------------------------------------------------------------------------


def mt_stage1_opt_state_template(params, cfg: MultitaskModelConfig,
                                 tcfg: TrainConfig):
    """Fresh optimizer state with run_mt_stage1's exact pytree structure
    (optax states are namedtuples — checkpoint restore needs a template)."""
    trainable, _ = O.partition(params, lambda p: mt_stage1_trainable(p, cfg))
    return O.make_stage_optimizer(
        tcfg.lr_stage1, tcfg.weight_decay
    ).init(trainable)


def mt_stage2_opt_state_template(params, cfg: MultitaskModelConfig,
                                 tcfg: TrainConfig):
    trainable, _ = O.partition(params, lambda p: mt_stage2_trainable(p, cfg))
    return O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    ).init(trainable)


def run_mt_stage1(
    params: dict,
    cfg: MultitaskModelConfig,
    tcfg: TrainConfig,
    epoch_batches: Callable[[int], Iterable],  # yields (task, (img, lab, valid))
    epochs: int,
    log: Callable[[str], None] = print,
    mesh=None,
    checkpoint_cb=None,
    guard=None,
    start_epoch: int = 1,
    init_opt_state=None,
    init_gpa=None,
) -> dict:
    """checkpoint_cb(epoch, params, {"opt_state", "gpa"}) fires after every
    epoch — the reference's multitask scripts save prompter state every 20
    epochs (..._hard_sharing.py:471-476). start_epoch/init_* resume
    mid-stage with the exact trajectory, as in trainer.run_stage1."""
    params = TR._commit_state(mesh, params)  # commit to device once
    trainable, frozen = O.partition(
        params, lambda p: mt_stage1_trainable(p, cfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1, tcfg.weight_decay)
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    steps = [
        make_mt_stage1_step(cfg, optimizer, t, mesh=mesh) for t in (0, 1)
    ]
    place = TR._batch_placer(mesh)

    def _get_state():
        return trainable, opt_state

    def _set_state(state):
        nonlocal trainable, opt_state
        trainable, opt_state = state

    pipe = TR.LossPipeline(guard, _get_state, _set_state)
    from tpu_reid.parallel.prefetch import device_prefetch

    def place_batch(item):
        task, (images, labels, valid) = item
        return task, place((images, labels, TR._as_device_array(valid)))

    gw = O.gauss_weights(*tcfg.gpa_stage1, epochs)
    gpa = init_gpa
    gstep = 0
    for epoch in range(start_epoch, epochs + 1):
        opt_state = O.set_lr(
            opt_state, S.cosine_warmup_lr(epoch, tcfg.lr_stage1, epochs)
        )
        for task, (images, labels, valid) in device_prefetch(
            epoch_batches(epoch), place_batch
        ):
            pipe.before_step(gstep)

            def dispatch(task=task, images=images, labels=labels,
                         valid=valid):
                nonlocal trainable, opt_state
                trainable, opt_state, loss = steps[task](
                    trainable, frozen, opt_state, images, labels, valid,
                )
                return loss

            gstep += 1
            pipe.after_step(dispatch(), redo=dispatch)
            if len(pipe.losses) % 50 == 1:
                log(f"[mt-stage1] epoch {epoch} step {len(pipe.losses)} "
                    f"loss {pipe.losses[-1]:.4f}")
        losses = pipe.drain_epoch()
        # stage-1 GPA only for the ivlp variant: the plain hard-sharing
        # script has its stage-1 averaging commented out
        # (reference: ..._hard_sharing.py:314,461-466 vs
        # ..._hard_sharing_ivlp.py:236,314-319)
        if cfg.variant == "hard_ivlp":
            gpa = O.gpa_update(gpa, O.combine(trainable, frozen), gw[epoch - 1])
        if losses:
            log(f"[mt-stage1] epoch {epoch}/{epochs} loss {np.mean(losses):.4f}")
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa})
    out = O.combine(trainable, frozen)
    if gpa is not None:
        out = gpa
    return out


def run_mt_stage2(
    params: dict,
    cfg: MultitaskModelConfig,
    tcfg: TrainConfig,
    epoch_batches: Callable[[int], Iterable],
    epochs: int,
    xbm_capacity: int = 128,
    xbm_start_epoch: int = 10,
    log: Callable[[str], None] = print,
    mesh=None,
    checkpoint_cb=None,
    guard=None,
    start_epoch: int = 0,
    init_opt_state=None,
    init_gpa=None,
    init_xbms=None,
) -> dict:
    """checkpoint_cb(epoch, params, {"opt_state", "gpa", "xbms"}) fires
    after every epoch (reference: ..._hard_sharing.py:676-681 saves the
    full model every 20 epochs). init_xbms restores the cross-batch memory
    banks so a resumed run mines against the same negatives."""
    params = TR._commit_state(mesh, params)  # commit to device once
    text_features = [
        jax.lax.stop_gradient(all_class_text_features_mt(params, cfg, t))
        for t in (0, 1)
    ]
    trainable, frozen = O.partition(
        params, lambda p: mt_stage2_trainable(p, cfg)
    )
    optimizer = O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    )
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(trainable))
    steps = [make_mt_stage2_step(cfg, tcfg, optimizer, t, mesh=mesh)
             for t in (0, 1)]
    place = TR._batch_placer(mesh)
    dim = cfg.clip.embed_dim
    xbms = (list(init_xbms) if init_xbms is not None
            else [X.init_xbm(xbm_capacity, dim), X.init_xbm(xbm_capacity, dim)])

    def _get_state():
        return trainable, frozen, opt_state, xbms[0], xbms[1]

    def _set_state(state):
        nonlocal trainable, frozen, opt_state
        trainable, frozen, opt_state, xbms[0], xbms[1] = state

    pipe = TR.LossPipeline(guard, _get_state, _set_state)
    from tpu_reid.parallel.prefetch import device_prefetch

    def place_batch(item):
        task, (images, labels, valid) = item
        return task, place((images, labels, TR._as_device_array(valid)))

    gw = O.gauss_weights(*tcfg.gpa_stage2, epochs)
    gpa = init_gpa
    gstep = 0
    for epoch in range(start_epoch, epochs):
        opt_state = O.set_lr(
            opt_state, S.warmup_multistep_lr(epoch, tcfg.lr_stage2)
        )
        use_xbm = jnp.asarray(epoch >= xbm_start_epoch)
        for task, (images, labels, valid) in device_prefetch(
            epoch_batches(epoch), place_batch
        ):
            pipe.before_step(gstep)

            def dispatch(task=task, images=images, labels=labels,
                         valid=valid, use_xbm=use_xbm):
                nonlocal trainable, frozen, opt_state
                trainable, frozen, opt_state, xbms[task], loss = steps[task](
                    trainable, frozen, opt_state, images, labels,
                    text_features[task], xbms[task], use_xbm, valid,
                )
                return loss

            gstep += 1
            pipe.after_step(dispatch(), redo=dispatch)
            if len(pipe.losses) % 50 == 1:
                log(f"[mt-stage2] epoch {epoch + 1} step {len(pipe.losses)} "
                    f"loss {pipe.losses[-1]:.4f}")
        losses = pipe.drain_epoch()
        gpa = O.gpa_update(gpa, O.combine(trainable, frozen), gw[epoch])
        if losses:
            log(f"[mt-stage2] epoch {epoch + 1}/{epochs} loss {np.mean(losses):.4f}")
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, O.combine(trainable, frozen),
                          {"opt_state": opt_state, "gpa": gpa, "xbms": xbms})
    out = O.combine(trainable, frozen)
    if gpa is not None:
        out = gpa
    return out
