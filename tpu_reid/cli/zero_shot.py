"""Zero-shot ReID evaluation CLI.

TPU-native equivalent of the reference entry point
(reference: zero_shot_learning.py:156-196). Flag surface mirrors the
reference (--root --bs --model_path --augmented_template --height --ratio
--mm --clip_weights --training_mode --test_dataset) plus the explicit
asset paths the reference hardcodes or downloads (--bpe_path,
--attributes).

    python -m tpu_reid.cli.zero_shot --root /data --model_path ViT-B-16.pt \
        --bpe_path bpe_simple_vocab_16e6.txt.gz \
        --attributes market_attribute.mat --augmented_template --mm
"""

from __future__ import annotations

import argparse

import numpy as np


def params_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="./", type=str)
    p.add_argument("--bs", default=64, type=int)
    p.add_argument("--model_path", required=True, type=str,
                   help="OpenAI CLIP checkpoint (.pt jit archive or .pth)")
    p.add_argument("--bpe_path", required=True, type=str,
                   help="bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--attributes", default=None, type=str,
                   help="market_attribute.mat (omit for simple templates)")
    p.add_argument("--augmented_template", action="store_true")
    p.add_argument("--height", default=224, type=int)
    p.add_argument("--ratio", default=0.5, type=float)
    p.add_argument("--stride", default=12, type=int)
    p.add_argument("--mm", action="store_true")
    p.add_argument("--clip_weights", type=str, default=None,
                   help="CLIP-ReID checkpoint to overlay (image_encoder.*)")
    p.add_argument("--training_mode", type=str, default="coop",
                   choices=["coop", "ivlp", "promptsrc"])
    p.add_argument("--test_dataset", type=str, default="market1501",
                   choices=["market1501", "dukemtmc", "msmt17", "msmt17_v1",
                            "veri", "vehicleid", "personx"])
    p.add_argument("--rerank", action="store_true")
    p.add_argument("--devices", default=1, type=int,
                   help="shard extraction + streamed rerank over a 'data' "
                        "mesh of this many devices")
    p.add_argument("--tp", default=1, type=int,
                   help="tensor-parallel width of the ViT tower over the "
                        "'model' mesh axis (total devices = devices * tp)")
    p.add_argument("--multihost", default=None, type=str, metavar="HOST:PORT",
                   help="multi-host extraction: coordinator address for "
                        "jax.distributed (run one process per host with "
                        "--num_hosts/--host_id; each host decodes only the "
                        "batch rows its own chips consume, features are "
                        "all-gathered once, the retrieval tail runs "
                        "identically on every host)")
    p.add_argument("--num_hosts", default=1, type=int,
                   help="with --multihost: total number of processes")
    p.add_argument("--host_id", default=0, type=int,
                   help="with --multihost: this process's index")
    p.add_argument("--no_flip_tta", action="store_true")
    p.add_argument("--fast_softmax", action="store_true",
                   help="throughput profile for the attention softmax "
                        "(bf16 probs on the XLA path; exp2/saturating-clamp "
                        "in the Pallas fused kernels — see "
                        "ops.attention.set_fast_softmax). ~10% faster "
                        "extraction; measured mAP delta at Market-1501 "
                        "scale recorded in BASELINE.md")
    p.add_argument("--log_dir", default=None, type=str)
    return p.parse_args()


def main():
    args = params_parser()
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
    import jax.numpy as jnp

    from tpu_reid.configs import PromptDesign
    from tpu_reid.data import attributes as A
    from tpu_reid.data.datasets import get_dataset
    from tpu_reid.data.loader import BatchLoader
    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models.tokenizer import ClipTokenizer
    from tpu_reid.parallel.extract import extract_embeddings, make_extractor
    from tpu_reid.pipelines import zero_shot as Z
    from tpu_reid.runtime.observe import MetricLogger
    from tpu_reid.weights.convert import (
        convert_clip, load_state_dict, overlay_clip_reid,
    )

    log = MetricLogger(args.log_dir)
    h, w = args.height, int(args.height * args.ratio)
    model_type = "vit"  # RN50 supported via checkpoint shape inference

    with log.phase("load_weights"):
        sd = load_state_dict(args.model_path)
        if args.clip_weights:
            sd = overlay_clip_reid(sd, load_state_dict(args.clip_weights))
        design = PromptDesign()
        if args.training_mode == "ivlp":
            design = PromptDesign(trainer="IVLP", vision_depth=12,
                                  vision_ctx=2, language_depth=12,
                                  language_ctx=2)
        cfg, params = convert_clip(sd, image_hw=(h, w), stride=args.stride,
                                   design=design)
        if cfg.vision is None:
            model_type = "rn"

    with log.phase("build_classifier"):
        tokenizer = ClipTokenizer(args.bpe_path)
        if args.attributes:
            if args.augmented_template:
                ids, templates = A.get_prompts_augmented(args.attributes)
            else:
                ids, templates = A.get_prompts(args.attributes)
        else:
            dataset_probe = get_dataset(args.root, args.test_dataset)
            n = len({r[1] for r in dataset_probe.query + dataset_probe.gallery})
            ids, templates = A.get_prompts_simple(
                [str(i) for i in range(n)], n
            )
        zs_weights = Z.zeroshot_classifier(
            params, cfg, tokenizer, ids, templates,
            augmented=args.augmented_template or not args.attributes,
        )

    mesh = None
    if args.multihost:
        import jax

        from tpu_reid.parallel.mesh import make_mesh

        assert args.tp == 1, "--multihost shards the batch axis only"
        n_data = len(jax.devices())
        assert args.bs % n_data == 0, \
            f"--bs {args.bs} must divide by the {n_data} global devices"
        mesh = make_mesh(n_data=n_data)
    elif args.devices > 1 or args.tp > 1:
        from tpu_reid.parallel.mesh import make_mesh

        assert args.bs % args.devices == 0, \
            f"--bs {args.bs} must divide by --devices {args.devices}"
        mesh = make_mesh(n_data=args.devices, n_model=args.tp)

    with log.phase("extract"):
        dataset = get_dataset(args.root, args.test_dataset)
        pp = DevicePreprocess((h, w), model_type, dtype=jnp.bfloat16)
        if args.tp > 1:
            # 2-D parallel ViT sweep: batch over "data", tower width
            # (attention heads + MLP hidden) over "model"
            assert model_type == "vit", "--tp shards the ViT tower only"
            from tpu_reid.parallel import tp as TP

            xtr_params = TP.shard_tp_visual(
                mesh,
                TP.tp_visual_layout(params["visual"], cfg.vision.heads),
            )
            extractor = TP.make_tp_extractor(
                mesh, cfg.vision, pp, flip_tta=not args.no_flip_tta,
                dtype=jnp.bfloat16,
            )
            replicate_params = False
        else:
            xtr_params = params
            fold = None
            if model_type == "vit":
                # normalization folded into the patch-embed weights inside
                # the jitted step (exact; kills the normalize pass)
                from tpu_reid.models.vit import fold_visual_input_norm

                fold = lambda p: dict(
                    p, visual=fold_visual_input_norm(p["visual"], model_type)
                )
            extractor = make_extractor(
                Z.make_zeroshot_embed(params, cfg), pp,
                flip_tta=not args.no_flip_tta, dtype=jnp.bfloat16, mesh=mesh,
                fold=fold,
            )
            replicate_params = True
        if args.multihost:
            from tpu_reid.parallel.multihost import (
                extract_embeddings_multihost,
            )

            g_feats, g_pids, g_cams, _ = extract_embeddings_multihost(
                extractor, xtr_params, dataset.gallery, args.bs, (h, w),
                mesh=mesh,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings_multihost(
                extractor, xtr_params, dataset.query, args.bs, (h, w),
                mesh=mesh,
            )
        else:
            g_feats, g_pids, g_cams, _ = extract_embeddings(
                extractor, xtr_params,
                BatchLoader(dataset.gallery, args.bs, (h, w)), mesh=mesh,
                replicate_params=replicate_params,
            )
            q_feats, q_pids, q_cams, _ = extract_embeddings(
                extractor, xtr_params,
                BatchLoader(dataset.query, args.bs, (h, w)), mesh=mesh,
                replicate_params=replicate_params,
            )
        log.log("extracted", gallery=len(g_pids), query=len(q_pids))

    # model weights are dead after extraction; at MSMT17 scale the
    # re-ranking evaluator needs every GB of HBM they pin
    del extractor, params, xtr_params, sd

    with log.phase("evaluate"):
        cmc, mAP, mINP = Z.evaluate_zero_shot(
            q_feats, g_feats, q_pids, g_pids, q_cams, g_cams,
            zs_weights=zs_weights, proj_dim=cfg.embed_dim,
            multimodal=args.mm, max_rank=50, reranking=args.rerank,
            # with --multihost the features were all-gathered to host
            # numpy and the tail runs process-locally (identical on every
            # host); the mesh stays with the extraction sweep
            mesh=None if args.multihost else mesh, with_minp=True,
        )
    def rank(k):  # gallery may be smaller than max_rank
        return float(cmc[min(k - 1, len(cmc) - 1)])

    log.log(
        "result", mAP=float(mAP),
        rank1=rank(1), rank5=rank(5), rank10=rank(10), mINP=float(mINP),
        host=host_id,
    )
    if host_id == 0:
        print(
            f"Rank@1: {rank(1):.4f}, Rank@5: {rank(5):.4f}, "
            f"Rank@10: {rank(10):.4f}, mAP: {mAP:.4f}, mINP: {mINP:.4f}"
        )
    return cmc, mAP


if __name__ == "__main__":
    main()
