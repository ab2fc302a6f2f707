"""Multitask prompt-learning CLI: two datasets, one shared trunk.

TPU-native equivalent of the three reference multitask entry points:
  --variant soft      (prompt_learning_multitask.py) — merged label space,
                      one model over n_cls1+n_cls2 classes
  --variant hard      (prompt_learning_multitask_hard_sharing.py) — shared
                      trunk, per-dataset prompt learners/heads/XBM
  --variant hard_ivlp (prompt_learning_multitask_hard_sharing_ivlp.py) —
                      + dual text towers and per-dataset resolutions

    python -m tpu_reid.cli.multitask --root /data --variant hard_ivlp \
        --model_path ViT-B-16.pt --bpe_path bpe.txt.gz \
        --train_dataset market1501 --train_dataset_multitask dukemtmc
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def params_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="./", type=str)
    p.add_argument("--bs", default=64, type=int)
    p.add_argument("--model_path", required=True, type=str)
    p.add_argument("--bpe_path", required=True, type=str)
    p.add_argument("--height", default=256, type=int)
    p.add_argument("--ratio", default=0.5, type=float)
    p.add_argument("--height_multitask", default=None, type=int)
    p.add_argument("--ratio_multitask", default=None, type=float)
    p.add_argument("--stride", default=12, type=int)
    p.add_argument("--epochs_stage1", default=120, type=int)
    p.add_argument("--epochs_stage2", default=60, type=int)
    p.add_argument("--variant", default="hard", type=str,
                   choices=["soft", "hard", "hard_ivlp"])
    p.add_argument("--training_mode", default="coop", type=str,
                   choices=["coop", "ivlp", "promptsrc", "adapter"],
                   help="soft variant only (reference: "
                        "prompt_learning_multitask.py:730); hard variants "
                        "fix their mode (coop / ivlp)")
    p.add_argument("--vpt_ctx", default=2, type=int)
    p.add_argument("--devices", default=1, type=int,
                   help="shard training + extraction + streamed rerank "
                        "over a 'data' mesh of this many devices")
    p.add_argument("--dtype", default="fp32", type=str,
                   choices=["fp32", "bf16"],
                   help="activation dtype for training (params stay fp32)")
    p.add_argument("--train_dataset", default="market1501", type=str)
    p.add_argument("--train_dataset_multitask", default="dukemtmc", type=str)
    p.add_argument("--test_dataset", default=None, type=str)
    p.add_argument("--save_path", default="./checkpoints", type=str)
    p.add_argument("--eval_every", default=0, type=int,
                   help="evaluate retrieval on the test dataset every N "
                        "stage-2 epochs and record it in the metric log "
                        "(0 = final evaluation only)")
    p.add_argument("--keep_best", action="store_true",
                   help="keep the best-mAP parameters among evaluated "
                        "checkpoints under <save_path>/.../best")
    p.add_argument("--multihost", default=None, type=str, metavar="HOST:PORT",
                   help="multi-host run: coordinator address for "
                        "jax.distributed (one process per host with "
                        "--num_hosts/--host_id); batches shard over every "
                        "process's devices, orbax checkpoints are written "
                        "once, evaluation all-gathers")
    p.add_argument("--num_hosts", default=1, type=int,
                   help="with --multihost: total number of processes")
    p.add_argument("--host_id", default=0, type=int,
                   help="with --multihost: this process's index")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--fast_softmax", action="store_true",
                   help="throughput profile for the attention softmax "
                        "(training + extraction; see "
                        "ops.attention.set_fast_softmax / BASELINE.md)")
    p.add_argument("--cache_device", action="store_true",
                   help="stage BOTH train splits in device HBM once and "
                        "serve every epoch's batches as on-device gathers "
                        "(sharded over the mesh under --devices N); kills "
                        "the per-epoch host decode + H2D transfer "
                        "(data/device_cache.py)")
    p.add_argument("--log_dir", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args()


def main():
    args = params_parser()
    args.test_dataset = args.test_dataset or args.train_dataset
    if args.fast_softmax:
        from tpu_reid.ops.attention import set_fast_softmax

        set_fast_softmax(True)

    host_id = 0
    if args.multihost:
        # must join the distributed runtime before anything touches a
        # device; after this jax.devices() spans every host
        from tpu_reid.parallel.multihost import init_distributed

        host_id, _ = init_distributed(
            args.multihost, args.num_hosts, args.host_id
        )

    import jax
    import jax.numpy as jnp

    from tpu_reid.configs import PromptDesign
    from tpu_reid.data.datasets import get_dataset
    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.data.sampler import PKSampler
    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models import prompts as P
    from tpu_reid.models import reid_clip as M
    from tpu_reid.models.prompts import base_template
    from tpu_reid.models.tokenizer import ClipTokenizer
    from tpu_reid.parallel.extract import extract_embeddings, make_extractor
    from tpu_reid.retrieval import Evaluator
    from tpu_reid.runtime.observe import MetricLogger
    from tpu_reid.train import multitask as MT
    from tpu_reid.train import trainer as TR
    from tpu_reid.weights.convert import convert_clip, load_state_dict

    log = MetricLogger(args.log_dir)
    h1, w1 = args.height, int(args.height * args.ratio)
    h2 = args.height_multitask or args.height
    w2 = int(h2 * (args.ratio_multitask or args.ratio))

    ds1 = get_dataset(args.root, args.train_dataset)
    ds2 = get_dataset(args.root, args.train_dataset_multitask)
    n1, n2 = ds1.num_train_pids, ds2.num_train_pids
    tokenizer = ClipTokenizer(args.bpe_path)
    tcfg = TR.TrainConfig(
        epochs_stage1=args.epochs_stage1, epochs_stage2=args.epochs_stage2
    )
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pp1 = DevicePreprocess((h1, w1), "vit", dtype=dtype)
    pp2 = DevicePreprocess((h2, w2), "vit", dtype=dtype)
    key = jax.random.key(args.seed)

    # prompt design: hard variants fix their mode; the soft variant follows
    # --training_mode (reference: prompt_learning_multitask.py:752-772)
    if args.variant == "soft":
        soft_mode = args.training_mode
    else:
        soft_mode = None
    ivlp = args.variant == "hard_ivlp" or soft_mode in ("ivlp", "promptsrc")
    design = PromptDesign()
    if ivlp:
        design = PromptDesign(
            trainer="IVLP", vision_depth=12, vision_ctx=args.vpt_ctx,
            language_depth=12, language_ctx=args.vpt_ctx,
        )
    sd = load_state_dict(args.model_path)
    cfg1, clip_params = convert_clip(
        sd, image_hw=(h1, w1), stride=args.stride, design=design
    )
    if ivlp:
        from tpu_reid.models.vit import init_vit
        from tpu_reid.models.text import init_text

        vinit = init_vit(jax.random.key(1), cfg1.vision)
        clip_params["visual"].setdefault("vpt_shallow", vinit["vpt_shallow"])
        clip_params["visual"].setdefault("vpt_deep", vinit["vpt_deep"])
        tinit = init_text(jax.random.key(2), cfg1.text)
        clip_params["text"].setdefault("vpt_deep", tinit["vpt_deep"])

    mesh = None
    if args.multihost:
        from tpu_reid.parallel.mesh import make_mesh

        n_data = len(jax.devices())
        assert args.bs % n_data == 0, \
            f"--bs {args.bs} must divide by the {n_data} global devices"
        mesh = make_mesh(n_data=n_data)
    elif args.devices > 1:
        from tpu_reid.parallel.mesh import make_mesh

        assert args.bs % args.devices == 0, \
            f"--bs {args.bs} must divide by --devices {args.devices}"
        mesh = make_mesh(n_data=args.devices)

    caches = {}
    if args.cache_device:
        # stage both train splits in HBM once (sharded over the mesh's
        # "data" axis under --devices N); every epoch's batches become an
        # on-device gather + jitted transform — no host decode or H2D
        # transfer in the epoch loops (data/device_cache.py). XBM and the
        # alternation/zip schedules are untouched: the trainers see the
        # same (imgs, pids, valid) stream.
        assert not args.multihost, \
            "--cache_device is a single-process feature (no --multihost)"
        import time as _t

        from tpu_reid.data.device_cache import DeviceImageCache

        for ds_, pp_ in ((ds1, pp1), (ds2, pp2)):
            t0 = _t.time()
            c = DeviceImageCache(ds_.train, pp_.size_hw, mesh=mesh)
            caches[(ds_.name, pp_.size_hw)] = c
            log.log("cache_device", dataset=ds_.name, n=c.n,
                    mb=round(c.nbytes() / 2**20, 1),
                    upload_s=round(_t.time() - t0, 1),
                    sharded=mesh is not None)

    def train_batches(dataset, pp, bs, epoch, pk=False, pad_hw=(10, 10)):
        # stable per-(dataset, epoch) augmentation stream
        tag = sum(map(ord, dataset.name)) & 0xFFFF
        k = jax.random.fold_in(key, (tag << 14) | (epoch & 0x3FFF))
        cache = caches.get((dataset.name, pp.size_hw))
        if cache is not None:
            if pk:
                labels = [r[1] for r in dataset.train]
                order = PKSampler(
                    labels, bs, 4, seed=args.seed + epoch
                ).epoch()
            else:
                rng = np.random.default_rng(args.seed + epoch)
                order = rng.permutation(cache.n)
            for i, (sel, pids, _camids, valid) in enumerate(
                cache.epoch_index_batches(order, bs, drop_tail=not pk)
            ):
                imgs = pp.train_batch(
                    cache.gather(sel), jax.random.fold_in(k, i),
                    pad_hw=pad_hw,
                )
                yield imgs, jnp.asarray(pids), valid
            return
        if pk:
            labels = [r[1] for r in dataset.train]
            order = PKSampler(labels, bs, 4, seed=args.seed + epoch).epoch()
        else:
            order = "shuffle"
        loader = BatchLoader(
            dataset.train, bs, pp.size_hw, order=order,
            seed=args.seed + epoch, drop_tail=not pk,
        )
        for i, b in enumerate(loader):
            imgs = pp.train_batch(
                jnp.asarray(b.images), jax.random.fold_in(k, i), pad_hw=pad_hw
            )
            # the trainers place every batch leaf onto the mesh themselves
            yield imgs, jnp.asarray(b.pids), b.valid

    # checkpointing + resume, shared with cli/prompt_learning (the
    # reference multitask scripts save prompter/model state every 20
    # epochs, ..._hard_sharing.py:471-476,676-681, and reload the latest
    # for the final test, :838)
    from tpu_reid.runtime.checkpoint import (
        CheckpointManager, two_stage_cb, two_stage_resume,
    )
    from tpu_reid.runtime.guard import TrainGuard

    ckpt_dir = os.path.join(
        args.save_path, args.variant, args.training_mode,
        f"{args.train_dataset}_{args.train_dataset_multitask}",
    )
    mgr = CheckpointManager(ckpt_dir, save_interval=20)

    def make_guard():
        return TrainGuard(snapshot_every=50, max_restores=3,
                          log=lambda s: log.log("guard", msg=s))

    stage_cb = lambda stage, step_of: two_stage_cb(mgr, stage, step_of)  # noqa: E731

    # --eval_every / --keep_best (same runtime features as the single-task
    # CLI): full retrieval evaluation on the test split, shared by the
    # periodic and final passes. The variant branch fills _eval_state["embed"]
    # before its stage-2 run.
    best_mgr = (
        CheckpointManager(os.path.join(ckpt_dir, "best"), max_to_keep=1,
                          save_interval=1)
        if args.keep_best else None
    )
    _best = {"mAP": -1.0}

    def maybe_keep_best(epoch_label: int, p, m: float):
        if best_mgr is not None and m > _best["mAP"]:
            _best["mAP"] = m
            best_mgr.save(
                epoch_label,
                {"params": p, "mAP": float(m), "epoch": epoch_label},
            )
            log.log("best", epoch=epoch_label, mAP=float(m))

    _eval_state: dict = {}

    def evaluate(eval_params):
        if "xtr" not in _eval_state:
            _eval_state["ds"] = get_dataset(args.root, args.test_dataset)
            _eval_state["pp"] = (
                pp1 if args.test_dataset == args.train_dataset else pp2
            )
            # fold the input normalization into the patch-embed weights
            # inside the jitted step (exact; kills the normalize pass)
            from tpu_reid.models.vit import fold_visual_input_norm

            fold = lambda p: dict(
                p, clip=dict(
                    p["clip"],
                    visual=fold_visual_input_norm(p["clip"]["visual"], "vit"),
                )
            )
            _eval_state["xtr"] = make_extractor(
                _eval_state["embed"], _eval_state["pp"], flip_tta=True,
                mesh=mesh, fold=fold,
            )
        test_ds, pp, extractor = (
            _eval_state["ds"], _eval_state["pp"], _eval_state["xtr"]
        )
        h, w = pp.size_hw
        if args.multihost:
            from tpu_reid.parallel.multihost import (
                extract_embeddings_multihost,
            )

            g_feats, g_pids, g_cams, _ = extract_embeddings_multihost(
                extractor, eval_params, test_ds.gallery, args.bs, (h, w),
                mesh=mesh,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings_multihost(
                extractor, eval_params, test_ds.query, args.bs, (h, w),
                mesh=mesh,
            )
        else:
            g_feats, g_pids, g_cams, _ = extract_embeddings(
                extractor, eval_params,
                BatchLoader(test_ds.gallery, args.bs, (h, w)), mesh=mesh,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings(
                extractor, eval_params,
                BatchLoader(test_ds.query, args.bs, (h, w)), mesh=mesh,
            )
        ev = Evaluator(num_query=len(q_pids), max_rank=20, feat_norm=True,
                       reranking=args.rerank,
                       mesh=None if args.multihost else mesh,
                       with_minp=True)
        ev.update(q_feats, q_pids, q_cams)
        ev.update(g_feats, g_pids, g_cams)
        return ev.compute()

    def stage2_cb():
        inner = stage_cb(1, lambda e: args.epochs_stage1 + e)
        if not args.eval_every:
            return inner

        def cb_with_eval(epoch, p, state):
            inner(epoch, p, state)
            done = epoch + 1  # stage-2 epochs are 0-based
            if done % args.eval_every == 0 and done < args.epochs_stage2:
                with log.phase("eval"):
                    c, m, i_ = evaluate(p)
                log.log("eval", stage2_epoch=done, mAP=float(m),
                        rank1=float(c[0]), mINP=float(i_))
                maybe_keep_best(done, p, float(m))

        return cb_with_eval

    def setup_resume(params, s1_tmpl, s2_tmpl, gpa1_used, gpa2_used,
                     xbm_tmpl=None):
        if not args.resume:
            kw1 = {"start_epoch": 1, "init_opt_state": None, "init_gpa": None}
            kw2 = {"start_epoch": 0, "init_opt_state": None, "init_gpa": None}
            if xbm_tmpl is not None:
                kw2["init_xbms"] = None
            return params, 0, kw1, kw2
        out = two_stage_resume(
            mgr, params, s1_tmpl, s2_tmpl, gpa1_used, gpa2_used,
            xbm_template=xbm_tmpl,
            log=lambda s: log.log("resume", msg=s),
        )
        log.log("resume", stage=out[1], epoch=mgr.latest_epoch())
        return out

    if args.variant == "soft":
        # ONE model over n1+n2 merged classes; dataset-2 labels offset by n1
        # (reference: prompt_learning_multitask.py:500,643). Geometry follows
        # the mode: coop/adapter use the CoOp splice (prefix 4, ctx 5),
        # ivlp/promptsrc the IVLP splice (reference: :61 PromptLearnerCoop
        # vs :295 VLPromptLearner).
        mode = soft_mode
        pcfg = (P.PromptLearnerConfig.coop(n1 + n2)
                if mode in ("coop", "adapter")
                else P.PromptLearnerConfig.ivlp(n1 + n2))
        tokens = tokenizer.tokenize(
            base_template(args.train_dataset),
            context_length=cfg1.text.context_length,
        )
        temb = np.asarray(clip_params["text"]["token_embedding"])[tokens]
        mcfg = M.ReidModelConfig(mode=mode, clip=cfg1, prompt=pcfg)
        zs = None
        if mode == "promptsrc":
            # frozen ZS teacher = copy of the pretrained tower (the working
            # reference construction, prompt_learning_multitask.py:760-771)
            zs = jax.tree.map(jnp.array, clip_params["visual"])
        params = M.init_reid_model(
            jax.random.key(args.seed), mcfg, clip_params, temb, tokens,
            zs_visual_params=zs,
        )
        print(f"[model] variant=soft mode={mode} n1={n1} n2={n2} "
              f"hw1={h1}x{w1}", flush=True)
        n_ds1 = len(ds1.train)

        def eval_batches(records, offset, epoch):
            # stage-1 val-transform loader: deterministic resize+normalize,
            # shuffled each epoch (reference: data_prepare.py:211-217)
            order = "shuffle" if epoch > 0 else None  # epoch 0 = precompute
            loader = BatchLoader(records, args.bs, (h1, w1), order=order,
                                 seed=args.seed + 7919 * epoch)
            for b in loader:
                yield (pp1.eval_batch(jnp.asarray(b.images)),
                       jnp.asarray(b.pids) + offset, b.valid)

        def s1(epoch):
            gens = (eval_batches(ds1.train, 0, epoch),
                    eval_batches(ds2.train, n1, epoch))
            if epoch == 0:  # cache-precompute sweep: ds1 rows then ds2 rows
                for g in gens:
                    yield from g
                return
            # per-step dataset alternation, draining both loaders
            # (reference: prompt_learning_multitask.py:477-503 cnt toggle)
            for _task, b in MT.alternate_longest(*gens):
                yield b

        def cached_order(epoch, labels):
            # the coop/adapter cached path's per-dataset alternation: shuffle
            # within each dataset's cache span, then interleave batches
            rng = np.random.default_rng((args.seed << 16) + epoch)
            i1 = rng.permutation(n_ds1)
            i2 = n_ds1 + rng.permutation(len(labels) - n_ds1)
            b1 = [i1[i:i + args.bs] for i in range(0, len(i1), args.bs)]
            b2 = [i2[i:i + args.bs] for i in range(0, len(i2), args.bs)]
            return [b for _t, b in MT.alternate_longest(b1, b2)]

        def offset_pids(gen, offset):
            for imgs, pids, valid in gen:
                yield imgs, pids + offset, valid

        def s2(epoch):
            # per-dataset PK loaders walked together, longer one drains
            # (reference: prompt_learning_multitask.py:629 zip_longest)
            g1 = train_batches(ds1, pp1, args.bs, epoch, pk=True)
            g2 = offset_pids(
                train_batches(ds2, pp1, args.bs, epoch, pk=True), n1
            )
            for _task, b in MT.chain_tasks_longest(g1, g2):
                yield b

        params, done_stage, kw1, kw2 = setup_resume(
            params,
            lambda p: TR.stage1_opt_state_template(p, mcfg, tcfg),
            lambda p: TR.stage2_opt_state_template(p, mcfg, tcfg),
            gpa1_used=(mode == "promptsrc"),
            gpa2_used=(mode == "promptsrc"),
        )
        if done_stage < 1:
            with log.phase("stage1"):
                params = TR.run_stage1(
                    params, mcfg, tcfg, s1, epochs=args.epochs_stage1,
                    batch_size=args.bs, cached_order=cached_order, mesh=mesh,
                    guard=make_guard(),
                    checkpoint_cb=stage_cb(0, lambda e: e),
                    log=lambda s: log.log("train", msg=s), **kw1,
                )
                mgr.save(args.epochs_stage1,
                         {"params": params, "stage": 1, "epoch_in_stage": -1})
        _eval_state["embed"] = lambda p, im: M.eval_embed(p, mcfg, im)
        if done_stage < 2:
            with log.phase("stage2"):
                params = TR.run_stage2(
                    params, mcfg, tcfg, s2, epochs=args.epochs_stage2,
                    mesh=mesh, guard=make_guard(),
                    checkpoint_cb=stage2_cb(),
                    log=lambda s: log.log("train", msg=s), **kw2,
                )
                mgr.save(
                    args.epochs_stage1 + args.epochs_stage2,
                    {"params": params, "stage": 2, "epoch_in_stage": -1},
                )
    else:
        mk_prompt = (P.PromptLearnerConfig.ivlp if ivlp
                     else P.PromptLearnerConfig.coop)
        pcfg1, pcfg2 = mk_prompt(n1), mk_prompt(n2)
        cfg2 = dataclass_replace_vision(cfg1, (h2, w2), args.stride)
        ctx_len = cfg1.text.context_length
        tok1 = tokenizer.tokenize(base_template(args.train_dataset),
                                  context_length=ctx_len)
        tok2 = tokenizer.tokenize(base_template(args.train_dataset_multitask),
                                  context_length=ctx_len)
        emb_table = np.asarray(clip_params["text"]["token_embedding"])
        mcfg = MT.MultitaskModelConfig(
            variant=args.variant, clip=cfg1, clip2=cfg2,
            prompt1=pcfg1, prompt2=pcfg2,
        )
        params = MT.init_multitask_model(
            jax.random.key(args.seed), mcfg, clip_params,
            emb_table[tok1], tok1, emb_table[tok2], tok2,
        )
        print(f"[model] variant={args.variant} n1={n1} n2={n2} "
              f"hw1={h1}x{w1} hw2={h2}x{w2}", flush=True)

        def eval_batches_mt(dataset, pp, epoch):
            # stage 1 consumes the val-transform loader — deterministic
            # resize+normalize, shuffled order (reference:
            # data_prepare.py:211-217, ..._hard_sharing.py:248-264)
            loader = BatchLoader(
                dataset.train, args.bs, pp.size_hw, order="shuffle",
                seed=args.seed + 7919 * epoch,
            )
            for b in loader:
                yield (pp.eval_batch(jnp.asarray(b.images)),
                       jnp.asarray(b.pids), b.valid)

        def s1(epoch):
            # plain hard drains both loaders (`or`); ivlp stops at the
            # shorter (`and`) — reference: ..._hard_sharing.py:331 vs
            # ..._hard_sharing_ivlp.py:253
            alt = (MT.alternate if args.variant == "hard_ivlp"
                   else MT.alternate_longest)
            return alt(eval_batches_mt(ds1, pp1, epoch),
                       eval_batches_mt(ds2, pp2, epoch))

        def s2(epoch):
            # plain hard: zip_longest; ivlp: zip (reference:
            # ..._hard_sharing.py:592 vs ..._hard_sharing_ivlp.py:452)
            pair = (MT.chain_tasks if args.variant == "hard_ivlp"
                    else MT.chain_tasks_longest)
            return pair(train_batches(ds1, pp1, args.bs, epoch, pk=True),
                        train_batches(ds2, pp2, args.bs, epoch, pk=True))

        params, done_stage, kw1, kw2 = setup_resume(
            params,
            lambda p: MT.mt_stage1_opt_state_template(p, mcfg, tcfg),
            lambda p: MT.mt_stage2_opt_state_template(p, mcfg, tcfg),
            gpa1_used=(args.variant == "hard_ivlp"),
            gpa2_used=True,  # mt stage 2 GPA is unconditional
            xbm_tmpl=lambda: [
                MT.X.init_xbm(2 * args.bs, mcfg.clip.embed_dim),
                MT.X.init_xbm(2 * args.bs, mcfg.clip.embed_dim),
            ],
        )
        if done_stage < 1:
            with log.phase("stage1"):
                params = MT.run_mt_stage1(
                    params, mcfg, tcfg, s1, epochs=args.epochs_stage1,
                    mesh=mesh, guard=make_guard(),
                    checkpoint_cb=stage_cb(0, lambda e: e),
                    log=lambda s: log.log("train", msg=s), **kw1,
                )
                mgr.save(args.epochs_stage1,
                         {"params": params, "stage": 1, "epoch_in_stage": -1})
        task = 0 if args.test_dataset == args.train_dataset else 1
        _eval_state["embed"] = lambda p, im: MT.eval_embed_mt(p, mcfg, task, im)
        if done_stage < 2:
            with log.phase("stage2"):
                params = MT.run_mt_stage2(
                    params, mcfg, tcfg, s2, epochs=args.epochs_stage2,
                    mesh=mesh, xbm_capacity=2 * args.bs, guard=make_guard(),
                    checkpoint_cb=stage2_cb(),
                    log=lambda s: log.log("train", msg=s), **kw2,
                )
                mgr.save(
                    args.epochs_stage1 + args.epochs_stage2,
                    {"params": params, "stage": 2, "epoch_in_stage": -1},
                )

    # drain the async checkpoint writer before the process can exit (an
    # in-flight orbax commit racing interpreter shutdown raises)
    mgr.close()

    with log.phase("test"):
        cmc, mAP, mINP = evaluate(params)
    maybe_keep_best(args.epochs_stage2, params, float(mAP))
    if best_mgr is not None:
        best_mgr.close()

    def rank(k):
        return float(cmc[min(k - 1, len(cmc) - 1)])

    log.log("result", mAP=float(mAP), rank1=rank(1), rank5=rank(5),
            rank10=rank(10), mINP=float(mINP), host=host_id)
    if host_id == 0:
        print(
            f"Rank@1: {rank(1):.4f}, Rank@5: {rank(5):.4f}, "
            f"Rank@10: {rank(10):.4f}, mAP: {mAP:.4f}, mINP: {mINP:.4f}"
        )
    return cmc, mAP


def dataclass_replace_vision(cfg, image_hw, stride):
    """Dataset-2 geometry: same tower, different patch grid."""
    import dataclasses

    from tpu_reid.configs import VisionConfig

    hg, wg = VisionConfig.grid_for(image_hw, cfg.vision.patch_size, stride)
    return dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, h_grid=hg, w_grid=wg)
    )


if __name__ == "__main__":
    main()
