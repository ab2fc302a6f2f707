"""Two-stage prompt-learning CLI (CoOp / IVLP / PromptSRC / CLIP-Adapter).

TPU-native equivalent of the reference entry point
(reference: prompt_learning.py:645-777): stage-1 prompt learning, stage-2
vision fine-tuning, then flip-TTA embedding extraction and CMC/mAP.

    python -m tpu_reid.cli.prompt_learning --root /data \
        --model_path ViT-B-16.pt --bpe_path bpe_simple_vocab_16e6.txt.gz \
        --training_mode ivlp --train_dataset market1501 \
        --epochs_stage1 120 --epochs_stage2 60 --save_path ./out
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
    p.add_argument("--stride", default=12, type=int)
    p.add_argument("--epochs_stage1", default=120, type=int)
    p.add_argument("--epochs_stage2", default=60, type=int)
    p.add_argument("--save_path", default="./checkpoints", type=str)
    p.add_argument("--vpt_ctx", default=2, type=int)
    p.add_argument("--training_mode", default="ivlp", type=str,
                   choices=["coop", "ivlp", "promptsrc", "adapter", "maple"])
    p.add_argument("--train_dataset", default="market1501", type=str)
    p.add_argument("--test_dataset", default=None, type=str,
                   help="defaults to --train_dataset")
    p.add_argument("--zs_weights", default=None, type=str,
                   help="separate checkpoint for the promptsrc zero-shot "
                        "teacher (e.g. MetaCLIP HF .bin; reference: "
                        "prompt_learning.py:695)")
    p.add_argument("--pretrained_vpt", default=None, type=str,
                   help="IVLP ImageNet-pretrained VPT checkpoint "
                        "(reference: clip_imagenet_pretrained_ivlp.pth.tar-5)")
    p.add_argument("--augmented_prompts", action="store_true",
                   help="4 article-variant prompt templates with shared "
                        "per-class ctx; text features are the mean over the "
                        "per-template encodings. The reference defines this "
                        "learner (coop.py:12-59, text_encoder.py:27-53) but "
                        "never instantiates it; person datasets only (the "
                        "templates say 'person')")
    p.add_argument("--jpm", action="store_true",
                   help="add the TransReID Jigsaw Patch Module branch: a "
                        "4th feature level (shuffled-patch re-run of the "
                        "last block) with its own BNNeck+ID head in stage 2 "
                        "and a concatenated eval embedding. The reference "
                        "defines the JPM tower but never wires it "
                        "(reference: coop.py:230-277, jpm.py); coop/adapter "
                        "modes only (no vision prompt tokens)")
    p.add_argument("--captions_file", default=None, type=str,
                   help="per-identity caption prompts ('label: description' "
                        "lines, e.g. from tools/caption_prompts.py). Uses the "
                        "GPT-4o caption prompt learner the reference defines "
                        "but never wires into an entry point "
                        "(reference: maple.py:93-169); ignored for --train_"
                        "dataset veri (car-type templates take precedence)")
    p.add_argument("--sie_camera", action="store_true",
                   help="SIE: learn a per-camera embedding added to the CLS "
                        "token (scaled by --sie_coe), applied in training "
                        "and inference. Every reference tower accepts the "
                        "cv_emb hook (coop.py:210-211) but no entry point "
                        "feeds it; this wires it CLIP-ReID-style")
    p.add_argument("--sie_view", action="store_true",
                   help="SIE over viewpoints (TransReID's full SIE is "
                        "camera x view): condition on the record's view id "
                        "(VeRi keypoint viewpoints; Market sequence ids). "
                        "Composes with --sie_camera into one embedding table")
    p.add_argument("--sie_coe", default=1.0, type=float,
                   help="SIE embedding coefficient")
    p.add_argument("--devices", default=1, type=int,
                   help="shard training + extraction + streamed rerank "
                        "over a 'data' mesh of this many devices "
                        "(reference is single-GPU; SURVEY.md §2.6)")
    p.add_argument("--dtype", default="fp32", type=str,
                   choices=["fp32", "bf16"],
                   help="activation dtype for training AND extraction; bf16 "
                        "is the TPU counterpart of the reference's fp16 AMP "
                        "(prompt_learning.py:404,450-453) and engages the "
                        "fused Pallas block path")
    p.add_argument("--eval_every", default=0, type=int,
                   help="evaluate retrieval (CMC/mAP/mINP on the test "
                        "dataset) every N stage-2 epochs and record it in "
                        "the metric log. 0 = only the final evaluation, as "
                        "the reference does. Stage 1 is excluded: it trains "
                        "text prompts only, which the image-embedding "
                        "retrieval metric cannot see")
    p.add_argument("--keep_best", action="store_true",
                   help="with --eval_every: keep the best-mAP parameters "
                        "seen at any evaluation (periodic or final) under "
                        "<save_path>/<mode>/<dataset>/best")
    p.add_argument("--multihost", default=None, type=str, metavar="HOST:PORT",
                   help="multi-host training + evaluation: coordinator "
                        "address for jax.distributed (one process per host "
                        "with --num_hosts/--host_id). The global batch "
                        "shards over every process's devices; gradient "
                        "psum rides ICI within a host and DCN across; "
                        "checkpoints are written once (orbax multihost); "
                        "evaluation extracts per-host and all-gathers")
    p.add_argument("--num_hosts", default=1, type=int,
                   help="with --multihost: total number of processes")
    p.add_argument("--host_id", default=0, type=int,
                   help="with --multihost: this process's index")
    p.add_argument("--cache_device", action="store_true",
                   help="stage the whole train split in device HBM once "
                        "(uint8, ~1.3 GB at Market scale) and serve every "
                        "epoch's batches as an on-device gather — removes "
                        "host decode + H2D transfer from the epoch loop "
                        "(single-process runs only)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--fast_softmax", action="store_true",
                   help="throughput profile for the attention softmax "
                        "(training + extraction; see "
                        "ops.attention.set_fast_softmax / BASELINE.md)")
    p.add_argument("--log_dir", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args()


def build_model(args, n_cls: int, car_types=None, n_sie_ids: int = 0):
    """Load + convert CLIP and assemble the ReID model for the chosen mode.

    n_sie_ids > 0 (from --sie_camera/--sie_view) sizes the learned SIE
    embedding table (cameras, viewpoints, or cameras x viewpoints)."""
    import jax

    from tpu_reid.configs import PromptDesign
    from tpu_reid.models import prompts as P
    from tpu_reid.models import reid_clip as M
    from tpu_reid.models.tokenizer import ClipTokenizer
    from tpu_reid.models.vit import init_vit
    from tpu_reid.models.text import init_text
    from tpu_reid.weights.convert import (
        convert_clip, load_state_dict, merge_pretrained,
    )

    h, w = args.height, int(args.height * args.ratio)
    design = PromptDesign()
    if args.training_mode in ("ivlp", "promptsrc"):
        design = PromptDesign(
            trainer="IVLP", vision_depth=12, vision_ctx=args.vpt_ctx,
            language_depth=12, language_ctx=args.vpt_ctx,
        )
    elif args.training_mode == "maple":
        design = PromptDesign(
            trainer="MaPLe", vision_depth=12, vision_ctx=args.vpt_ctx,
            language_depth=12, language_ctx=args.vpt_ctx,
            maple_length=args.vpt_ctx,
        )
    sd = load_state_dict(args.model_path)
    cfg, clip_params = convert_clip(
        sd, image_hw=(h, w), stride=args.stride, design=design
    )

    if design.has_vision_prompts:
        # fresh VPT tokens (checkpoint has none), then optionally overlay
        # ImageNet-pretrained VPT weights (reference:
        # prompt_learning.py:721-745 keeps only VPT keys, shape-tolerant)
        vinit = init_vit(jax.random.key(1), cfg.vision)
        tinit = init_text(jax.random.key(2), cfg.text)
        # MaPLe designs carry no tower-level vpt_deep (deep prompts come from
        # the text->vision projection, reference maple.py:617-644), so only
        # seed the keys the design's init actually produces.
        for k in ("vpt_shallow", "vpt_deep"):
            if k in vinit:
                clip_params["visual"].setdefault(k, vinit[k])
        if "vpt_deep" in tinit:
            clip_params["text"].setdefault("vpt_deep", tinit["vpt_deep"])
        if args.pretrained_vpt:
            vpt_sd = load_state_dict(args.pretrained_vpt)
            from tpu_reid.weights.convert import convert_vit, convert_text

            vpt_only = {
                k: v for k, v in vpt_sd.items() if "VPT" in k
            }
            if vpt_only:
                full = dict(sd)
                full.update(vpt_only)
                upd_v = convert_vit(full, cfg.vision)
                upd_t = convert_text(full, cfg.text)
                clip_params["visual"] = merge_pretrained(
                    clip_params["visual"],
                    {k: upd_v[k] for k in ("vpt_shallow", "vpt_deep")
                     if k in upd_v},
                )
                clip_params["text"] = merge_pretrained(
                    clip_params["text"],
                    {k: upd_t[k] for k in ("vpt_deep",) if k in upd_t},
                )

    # prompt templates
    from tpu_reid.models.prompts import (
        base_template, read_caption_prompts, veri_templates,
    )

    tokenizer = ClipTokenizer(args.bpe_path)
    captions_file = getattr(args, "captions_file", None)
    if args.train_dataset == "veri" and car_types is not None:
        if args.training_mode in ("ivlp", "promptsrc"):
            pcfg = P.PromptLearnerConfig.veri_ivlp(n_cls)
            texts = veri_templates(car_types, n_cls_ctx=4)
        else:
            pcfg = P.PromptLearnerConfig.veri(n_cls)
            texts = veri_templates(car_types, n_cls_ctx=3)
        tokens = tokenizer.tokenize(
            texts, context_length=cfg.text.context_length, truncate=True
        )
    elif captions_file:
        # per-class caption templates: frozen prefix = SOT + first 4 caption
        # tokens, 4 learnable ctx spliced in, EOT shifted past the insertion
        # (reference: maple.py:93-169 — VLPromptLearnerGPT4o, which no
        # reference entry point instantiates; docs/DIVERGENCES.md #6)
        pcfg = P.PromptLearnerConfig.captions(n_cls)
        texts = read_caption_prompts(captions_file, n_cls)
        tokens = tokenizer.tokenize(
            texts, context_length=cfg.text.context_length, truncate=True
        )
    elif getattr(args, "augmented_prompts", False):
        # 4 article-variant templates, shared per-class ctx, mean-pooled
        # text features (reference: coop.py:12-59 PromptLearnerAugmented —
        # imported by two reference scripts, instantiated by none)
        from tpu_reid.models.prompts import AUGMENTED_TEMPLATES, PERSON_DATASETS

        assert args.train_dataset in PERSON_DATASETS, (
            "--augmented_prompts templates are person-phrased; use the "
            "default template for vehicle datasets"
        )
        pcfg = P.PromptLearnerConfig.augmented(n_cls)
        tokens = tokenizer.tokenize(
            list(AUGMENTED_TEMPLATES),
            context_length=cfg.text.context_length,
        )
    else:
        pcfg = (P.PromptLearnerConfig.coop(n_cls)
                if args.training_mode in ("coop", "adapter")
                else P.PromptLearnerConfig.ivlp(n_cls))  # ivlp geometry for
        # maple too (per-class ctx + coupled deep prompts)
        tokens = tokenizer.tokenize(
            base_template(args.train_dataset),
            context_length=cfg.text.context_length,
        )
    temb = np.asarray(clip_params["text"]["token_embedding"])[tokens]

    use_jpm = getattr(args, "jpm", False)
    if use_jpm:
        assert args.training_mode in ("coop", "adapter"), (
            "--jpm requires a prompt-free vision tower "
            "(--training_mode coop or adapter)"
        )
    mcfg = M.ReidModelConfig(
        mode=args.training_mode, clip=cfg, prompt=pcfg, use_jpm=use_jpm,
        sie_ids=n_sie_ids, sie_coe=getattr(args, "sie_coe", 1.0),
    )
    zs = None
    if args.training_mode == "promptsrc":
        import jax.numpy as jnp

        if args.zs_weights:
            # frozen zero-shot teacher from a SEPARATE checkpoint — the
            # reference's intent is a MetaCLIP HF .bin teacher
            # (prompt_learning.py:695, which crashes as written; its
            # metaclip builder would run the weights through QuickGELU
            # anyway, metaclip.py:589, so the shared tower math here is
            # behaviorally faithful). Any supported format works; the
            # architecture must match the student's.
            zs_cfg, zs_params = convert_clip(
                load_state_dict(args.zs_weights), image_hw=(h, w),
                stride=args.stride,
            )
            assert (
                zs_cfg.vision is not None
                and zs_cfg.vision.width == cfg.vision.width
                and zs_cfg.vision.layers == cfg.vision.layers
                and zs_cfg.vision.patch_size == cfg.vision.patch_size
            ), "ZS teacher architecture must match the student tower"
            zs = jax.tree.map(jnp.array, zs_params["visual"])
        else:
            # teacher = a copy of the pretrained tower (the reference
            # multitask path builds it via a depth-0 maple model,
            # prompt_learning_multitask.py:760-771)
            zs = jax.tree.map(jnp.array, clip_params["visual"])
    params = M.init_reid_model(
        jax.random.key(args.seed), mcfg, clip_params, temb, tokens,
        zs_visual_params=zs,
    )
    return mcfg, params, (h, w)


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

    from tpu_reid.data.datasets import get_dataset
    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.data.sampler import PKSampler
    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models import reid_clip as M
    from tpu_reid.parallel.extract import extract_embeddings, make_extractor
    from tpu_reid.retrieval import Evaluator
    from tpu_reid.runtime.checkpoint import CheckpointManager
    from tpu_reid.runtime.observe import MetricLogger
    from tpu_reid.train import trainer as TR

    log = MetricLogger(args.log_dir)
    dataset = get_dataset(args.root, args.train_dataset)
    n_cls = dataset.num_train_pids
    # SIE table: cameras x viewpoints (TransReID composition); either
    # factor alone when only one flag is set
    sie_cam = getattr(args, "sie_camera", False)
    sie_view = getattr(args, "sie_view", False)
    n_sie, n_views = 0, 1
    if sie_cam or sie_view:
        recs = dataset.train + dataset.query + dataset.gallery
        n_cams = (1 + max(r[2] for r in recs)) if sie_cam else 1
        n_views = (1 + max(r[3] for r in recs)) if sie_view else 1
        n_sie = n_cams * n_views

        def sie_ids_of(b):
            ids = np.zeros(len(b.pids), np.int64)
            if sie_cam:
                ids = np.asarray(b.camids, np.int64) * n_views
            if sie_view:
                ids = ids + np.minimum(
                    np.asarray(b.seqids, np.int64), n_views - 1
                )
            return ids.astype(np.int32)
    else:
        sie_ids_of = None
    mcfg, params, (h, w) = build_model(
        args, n_cls, dataset.car_types_train, n_sie_ids=n_sie
    )
    log.log("model", mode=args.training_mode, n_cls=n_cls, h=h, w=w,
            sie_ids=n_sie)

    # bf16 activations: params stay fp32 (the layers cast weights to the
    # activation dtype on the fly), so the optimizer sees full-precision
    # master weights — the TPU analog of the reference's AMP training
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pp = DevicePreprocess((h, w), "vit", dtype=dtype)
    key = jax.random.key(args.seed)

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

    cache = None
    if getattr(args, "cache_device", False):
        # stage the whole train split in HBM once; every epoch's batches
        # become an on-device gather + jitted transform — no host decode
        # or H2D transfer in the epoch loop (data/device_cache.py). With
        # --devices N the split is row-sharded over the mesh's "data" axis
        # and gathers come back batch-sharded (ICI row exchange).
        assert not args.multihost and not n_sie, (
            "--cache_device is a single-process feature (no --multihost) "
            "and does not carry SIE side-info ids"
        )
        from tpu_reid.data.device_cache import DeviceImageCache

        import time as _t

        t0 = _t.time()
        cache = DeviceImageCache(dataset.train, (h, w), mesh=mesh)
        log.log("cache_device", n=cache.n,
                mb=round(cache.nbytes() / 2**20, 1),
                upload_s=round(_t.time() - t0, 1),
                sharded=mesh is not None)

    def stage1_batches(epoch):
        # stage 1 always consumes the VAL-transform loader — deterministic
        # resize+normalize, shuffled order — for both the cached and the
        # live (ivlp/promptsrc) paths (reference: prompt_learning.py:708-710
        # passes loader_train_val built with the val transform)
        if cache is not None:
            rng = np.random.default_rng(args.seed + epoch)
            order = (rng.permutation(cache.n) if epoch > 0
                     else np.arange(cache.n))
            for sel, pids, _camids, valid in cache.epoch_index_batches(
                order, args.bs, drop_tail=epoch > 0
            ):
                yield (pp.eval_batch(cache.gather(sel)),
                       jnp.asarray(pids), valid)
            return
        order = "shuffle" if epoch > 0 else None  # epoch 0 = cached precompute
        loader = BatchLoader(
            dataset.train, args.bs, (h, w), order=order,
            seed=args.seed + epoch, drop_tail=epoch > 0,
        )
        for b in loader:
            # the trainers place every batch leaf onto the mesh themselves
            out = (pp.eval_batch(jnp.asarray(b.images)),
                   jnp.asarray(b.pids), b.valid)
            if n_sie:  # SIE: side-info ids ride as a trailing element
                out = out + (jnp.asarray(sie_ids_of(b)),)
            yield out

    def stage2_batches(epoch):
        labels = [r[1] for r in dataset.train]
        sampler = PKSampler(labels, args.bs, 4, seed=args.seed + epoch)
        k = jax.random.fold_in(key, 10_000 + epoch)
        if cache is not None:
            for i, (sel, pids, _camids, valid) in enumerate(
                cache.epoch_index_batches(sampler.epoch(), args.bs)
            ):
                imgs = pp.train_batch(
                    cache.gather(sel), jax.random.fold_in(k, i),
                    pad_hw=(10, 10),
                )
                yield imgs, jnp.asarray(pids), valid
            return
        loader = BatchLoader(
            dataset.train, args.bs, (h, w), order=sampler.epoch()
        )
        for i, b in enumerate(loader):
            imgs = pp.train_batch(
                jnp.asarray(b.images), jax.random.fold_in(k, i),
                pad_hw=(10, 10),
            )
            out = (imgs, jnp.asarray(b.pids), b.valid)
            if n_sie:
                out = out + (jnp.asarray(sie_ids_of(b)),)
            yield out

    tcfg = TR.TrainConfig(
        epochs_stage1=args.epochs_stage1, epochs_stage2=args.epochs_stage2
    )
    ckpt_dir = os.path.join(
        args.save_path, args.training_mode, args.train_dataset
    )
    mgr = CheckpointManager(ckpt_dir, save_interval=20)

    # --resume: restore the newest checkpoint and continue EXACTLY where
    # the run stopped — params, optimizer state and (promptsrc) the GPA
    # accumulator, mid-stage (the reference has no resume at all,
    # SURVEY.md §5). Shared orchestration: runtime.checkpoint.
    from tpu_reid.runtime.checkpoint import two_stage_cb, two_stage_resume

    kw1 = {"start_epoch": 1, "init_opt_state": None, "init_gpa": None}
    kw2 = {"start_epoch": 0, "init_opt_state": None, "init_gpa": None}
    done_stage = 0
    if args.resume:
        params, done_stage, kw1, kw2 = two_stage_resume(
            mgr, params,
            lambda p: TR.stage1_opt_state_template(p, mcfg, tcfg),
            lambda p: TR.stage2_opt_state_template(p, mcfg, tcfg),
            gpa1_used=(args.training_mode == "promptsrc"),
            gpa2_used=(args.training_mode == "promptsrc"),
            log=lambda s: log.log("resume", msg=s),
        )
        log.log("resume", stage=done_stage, epoch=mgr.latest_epoch())

    from tpu_reid.runtime.guard import TrainGuard

    def make_guard():
        # divergence rollback, always on: snapshots every 50 steps, rolls
        # back and skips the batch on a non-finite loss (SURVEY §5 gap)
        return TrainGuard(
            snapshot_every=50, max_restores=3,
            log=lambda s: log.log("guard", msg=s),
        )

    cb = lambda stage, step_of: two_stage_cb(mgr, stage, step_of)  # noqa: E731

    # best is chosen among evaluated checkpoints: every --eval_every
    # epochs plus the final test pass (without --eval_every it reduces to
    # the final parameters)
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

    # full retrieval evaluation on the test split; shared by the periodic
    # (--eval_every) and the final passes — extractor/dataset built once
    _eval_state: dict = {}

    def evaluate(eval_params):
        if not _eval_state:
            _eval_state["ds"] = get_dataset(args.root, args.test_dataset)
            # input normalization folded into the patch-embed weights
            # inside the jitted step (exact; kills the normalize pass)
            fold = lambda p: M.fold_input_norm(p, mcfg, "vit")
            if n_sie:
                # SIE applies at inference too (ids past the training
                # range clamp to the last embedding row inside the model)
                _eval_state["xtr"] = make_extractor(
                    lambda p, im, cv: M.eval_embed(p, mcfg, im, cv_ids=cv),
                    pp, flip_tta=True, mesh=mesh, with_cv_ids=True,
                    fold=fold,
                )
            else:
                _eval_state["xtr"] = make_extractor(
                    lambda p, im: M.eval_embed(p, mcfg, im),
                    pp, flip_tta=True, mesh=mesh, fold=fold,
                )
        test_ds, extractor = _eval_state["ds"], _eval_state["xtr"]
        if args.multihost:
            # per-host decode of each host's own batch slice, one feature
            # all-gather; the retrieval tail then runs process-locally and
            # identically on every host
            from tpu_reid.parallel.multihost import (
                extract_embeddings_multihost,
            )

            g_feats, g_pids, g_cams, _ = extract_embeddings_multihost(
                extractor, eval_params, test_ds.gallery, args.bs, (h, w),
                mesh=mesh, cv_ids_of=sie_ids_of,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings_multihost(
                extractor, eval_params, test_ds.query, args.bs, (h, w),
                mesh=mesh, cv_ids_of=sie_ids_of,
            )
        else:
            g_feats, g_pids, g_cams, _ = extract_embeddings(
                extractor, eval_params,
                BatchLoader(test_ds.gallery, args.bs, (h, w)),
                mesh=mesh, cv_ids_of=sie_ids_of,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings(
                extractor, eval_params,
                BatchLoader(test_ds.query, args.bs, (h, w)),
                mesh=mesh, cv_ids_of=sie_ids_of,
            )
        ev = Evaluator(
            num_query=len(q_pids), max_rank=10, feat_norm=True,
            reranking=args.rerank, mesh=None if args.multihost else mesh,
            with_minp=True,
        )
        ev.update(q_feats, q_pids, q_cams)
        ev.update(g_feats, g_pids, g_cams)
        return ev.compute()

    def stage2_cb():
        inner = cb(1, lambda e: args.epochs_stage1 + e)
        if not args.eval_every:
            return inner

        def cb_with_eval(epoch, p, state):
            inner(epoch, p, state)
            done = epoch + 1  # run_stage2 epochs are 0-based
            if done % args.eval_every == 0 and done < args.epochs_stage2:
                with log.phase("eval"):
                    c, m, i_ = evaluate(p)
                log.log("eval", stage2_epoch=done, mAP=float(m),
                        rank1=float(c[0]), mINP=float(i_))
                maybe_keep_best(done, p, float(m))

        return cb_with_eval

    if done_stage < 1:
        with log.phase("stage1"):
            live_mode = args.training_mode not in ("coop", "adapter")
            if cache is not None and mesh is None and live_mode:
                # live stage 1 (VPT tokens retrain the encoder every
                # step) served from the HBM-resident cache, `chunk`
                # steps per dispatch (trainer.run_stage1_live_cached) —
                # same val-transform batches/order as stage1_batches
                def stage1_order(epoch):
                    # run_stage1's live epochs are 1-based, so this
                    # mirrors stage1_batches(epoch>=1): shuffled order,
                    # tail dropped (the epoch-0 sequential pass exists
                    # only for the coop/adapter feature precompute)
                    rng = np.random.default_rng(args.seed + epoch)
                    return cache.epoch_index_batches(
                        rng.permutation(cache.n), args.bs, drop_tail=True
                    )

                params = TR.run_stage1_live_cached(
                    params, mcfg, tcfg, cache, stage1_order, pp,
                    epochs=args.epochs_stage1, guard=make_guard(),
                    log=lambda s: log.log("train", msg=s),
                    checkpoint_cb=cb(0, lambda e: e), **kw1,
                )
            else:
                params = TR.run_stage1(
                    params, mcfg, tcfg, stage1_batches,
                    epochs=args.epochs_stage1,
                    batch_size=args.bs, mesh=mesh, guard=make_guard(),
                    log=lambda s: log.log("train", msg=s),
                    checkpoint_cb=cb(0, lambda e: e), **kw1,
                )
            mgr.save(args.epochs_stage1,
                     {"params": params, "stage": 1, "epoch_in_stage": -1})

    if done_stage < 2:
        with log.phase("stage2"):
            if cache is not None and mesh is None:
                # HBM-resident split + single device: run `chunk` steps
                # per dispatch (gather + fused transform + step in ONE
                # lax.scan program) — the per-step host dispatch overhead
                # (~5 x ~30 ms through a remote link) otherwise dwarfs
                # the ~90 ms step compute. Same RNG stream/batches as the
                # host-driven path (train/trainer.py::run_stage2_cached).
                def stage2_order(epoch):
                    labels = [r[1] for r in dataset.train]
                    sampler = PKSampler(labels, args.bs, 4,
                                        seed=args.seed + epoch)
                    return cache.epoch_index_batches(
                        sampler.epoch(), args.bs
                    )

                params = TR.run_stage2_cached(
                    params, mcfg, tcfg, cache, stage2_order, pp, key,
                    epochs=args.epochs_stage2, guard=make_guard(),
                    log=lambda s: log.log("train", msg=s),
                    checkpoint_cb=stage2_cb(), **kw2,
                )
            else:
                params = TR.run_stage2(
                    params, mcfg, tcfg, stage2_batches,
                    epochs=args.epochs_stage2,
                    mesh=mesh, guard=make_guard(),
                    log=lambda s: log.log("train", msg=s),
                    checkpoint_cb=stage2_cb(), **kw2,
                )
            mgr.save(
                args.epochs_stage1 + args.epochs_stage2,
                {"params": params, "stage": 2, "epoch_in_stage": -1},
            )
    # drain the async checkpoint writer before the process can exit —
    # an in-flight orbax commit racing interpreter shutdown dies with
    # "cannot schedule new futures after shutdown"
    mgr.close()

    with log.phase("test"):
        cmc, mAP, mINP = evaluate(params)
    maybe_keep_best(args.epochs_stage2, params, float(mAP))
    if best_mgr is not None:
        best_mgr.close()
    def rank(k):  # gallery may be smaller than max_rank
        return float(cmc[min(k - 1, len(cmc) - 1)])

    log.log("result", mAP=float(mAP), rank1=rank(1),
            rank5=rank(5), rank10=rank(10), mINP=float(mINP), host=host_id)
    if host_id == 0:
        print(
            f"Rank@1: {rank(1):.4f}, Rank@5: {rank(5):.4f}, "
            f"Rank@10: {rank(10):.4f}, mAP: {mAP:.4f}, mINP: {mINP:.4f}"
        )
    return cmc, mAP


if __name__ == "__main__":
    main()
