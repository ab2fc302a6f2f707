"""Multitask trainer tests: hard sharing (+XBM) and hard-sharing IVLP with
dual text towers + per-dataset resolutions; plus the multitask CLI."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.torch_oracle as oracle
from tpu_reid.configs import PromptDesign
from tpu_reid.models import prompts as P
from tpu_reid.train import multitask as MT
from tpu_reid.train import xbm as X
from tpu_reid.train.trainer import TrainConfig
from tpu_reid.weights.convert import convert_clip

pytestmark = pytest.mark.slow  # multitask e2e; pure-logic tests stay fast

RNG = np.random.RandomState(0)


def build_mt(variant="hard", hw2=(32, 16)):
    design = PromptDesign()
    if variant == "hard_ivlp":
        design = PromptDesign(trainer="IVLP", vision_depth=2, vision_ctx=2,
                              language_depth=2, language_ctx=2)
    sd = oracle.make_clip_state_dict(
        RNG, vision_width=64, vision_layers=2, patch=8, grid=4,
        text_width=128, text_layers=2, vocab=120, context=12, embed_dim=32,
    )
    cfg1, cparams = convert_clip(sd, image_hw=(32, 16), stride=8, design=design)
    if variant == "hard_ivlp":
        from tpu_reid.models.vit import init_vit
        from tpu_reid.models.text import init_text

        vinit = init_vit(jax.random.key(9), cfg1.vision)
        cparams["visual"]["vpt_shallow"] = vinit["vpt_shallow"]
        cparams["visual"]["vpt_deep"] = vinit["vpt_deep"]
        cparams["text"]["vpt_deep"] = init_text(
            jax.random.key(10), cfg1.text
        )["vpt_deep"]
    import dataclasses

    from tpu_reid.configs import VisionConfig

    hg, wg = VisionConfig.grid_for(hw2, 8, 8)
    cfg2 = dataclasses.replace(
        cfg1, vision=dataclasses.replace(cfg1.vision, h_grid=hg, w_grid=wg)
    )
    mk = (P.PromptLearnerConfig.ivlp if variant == "hard_ivlp"
          else P.PromptLearnerConfig.coop)
    mcfg = MT.MultitaskModelConfig(
        variant=variant, clip=cfg1, clip2=cfg2,
        prompt1=mk(5), prompt2=mk(4),
    )
    tokens = np.zeros((1, 12), np.int32)
    tokens[0, 0] = 118
    tokens[0, 1:10] = RNG.randint(1, 117, 9)
    tokens[0, 10] = 119
    emb = np.asarray(cparams["text"]["token_embedding"])[tokens]
    params = MT.init_multitask_model(
        jax.random.key(0), mcfg, cparams, emb, tokens, emb, tokens
    )
    return mcfg, params


def batches(task_hw, n_cls, n=2, bs=8, seed=0):
    rng = np.random.RandomState(seed)
    h, w = task_hw
    return [
        (jnp.asarray(rng.randn(bs, h, w, 3).astype(np.float32)),
         jnp.asarray(np.repeat(rng.choice(n_cls, bs // 4, replace=False), 4)),
         np.ones(bs, bool))
        for _ in range(n)
    ]


def leaves_equal(a, b):
    return all(np.allclose(x, y)
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_hard_sharing_stage1_updates_both_prompts():
    mcfg, params = build_mt("hard")
    def sched(epoch):
        return MT.alternate(batches((32, 16), 5), batches((32, 16), 4))
    out = MT.run_mt_stage1(params, mcfg, TrainConfig(), sched, epochs=2,
                           log=lambda s: None)
    # plain hard: NO stage-1 GPA (reference has it commented out,
    # ..._hard_sharing.py:461-466) — output is the last-epoch weights
    assert not np.allclose(np.asarray(out["prompt1"]["cls_ctx"]),
                           np.asarray(params["prompt1"]["cls_ctx"]))
    assert not np.allclose(np.asarray(out["prompt2"]["cls_ctx"]),
                           np.asarray(params["prompt2"]["cls_ctx"]))
    # frozen leaves must be bit-identical to the input (a GPA average of
    # identical snapshots would only match approximately)
    np.testing.assert_array_equal(
        np.asarray(out["clip"]["visual"]["proj"]),
        np.asarray(params["clip"]["visual"]["proj"]),
    )


def test_hard_ivlp_dual_text_and_resolutions():
    mcfg, params = build_mt("hard_ivlp", hw2=(40, 24))
    assert "text2" in params
    assert "pos_embed2" in params
    # task-1 text path uses the second tower: same label, different features
    f1 = MT.encode_text_mt(params, mcfg, 0, jnp.array([1]))
    # perturb text2 and confirm task-1 output shifts while task-0 is stable
    params2 = dict(params)
    params2["text2"] = jax.tree.map(lambda x: x + 0.01, params["text2"])
    f2a = MT.encode_text_mt(params2, mcfg, 1, jnp.array([1]))
    f2b = MT.encode_text_mt(params, mcfg, 1, jnp.array([1]))
    assert not np.allclose(np.asarray(f2a), np.asarray(f2b))
    np.testing.assert_allclose(
        np.asarray(MT.encode_text_mt(params2, mcfg, 0, jnp.array([1]))),
        np.asarray(f1), atol=1e-6,
    )
    # per-dataset resolutions run through the shared trunk
    e1 = MT.eval_embed_mt(params, mcfg, 0, jnp.zeros((2, 32, 16, 3)))
    e2 = MT.eval_embed_mt(params, mcfg, 1, jnp.zeros((2, 40, 24, 3)))
    assert e1.shape == e2.shape == (2, 64 + 32)


def test_hard_stage2_with_xbm():
    mcfg, params = build_mt("hard")
    def sched(epoch):
        return MT.chain_tasks(batches((32, 16), 5, seed=epoch),
                              batches((32, 16), 4, seed=epoch + 50))
    out = MT.run_mt_stage2(params, mcfg, TrainConfig(), sched, epochs=2,
                           xbm_capacity=16, xbm_start_epoch=0,
                           log=lambda s: None)
    assert not leaves_equal(out["clip"]["visual"]["blocks"],
                            params["clip"]["visual"]["blocks"])
    # prompts frozen in stage 2... but GPA averages snapshots of the same
    # frozen values, so they must be unchanged
    np.testing.assert_allclose(np.asarray(out["prompt1"]["cls_ctx"]),
                               np.asarray(params["prompt1"]["cls_ctx"]),
                               atol=1e-6)


@pytest.mark.fast
def test_xbm_ring_buffer():
    st = X.init_xbm(8, 4)
    assert not bool(X.xbm_is_full(st))
    f = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    st, slots = X.xbm_enqueue(st, f, jnp.arange(6))
    np.testing.assert_array_equal(np.asarray(slots), np.arange(6))
    assert not bool(X.xbm_is_full(st))
    st, slots = X.xbm_enqueue(st, f[:4], jnp.arange(4))
    # wraparound: slots 6,7,0,1
    np.testing.assert_array_equal(np.asarray(slots), [6, 7, 0, 1])
    assert bool(X.xbm_is_full(st))
    feats, labels, valid = X.xbm_get(st)
    assert bool(valid.all())


def test_multitask_cli_hard(tmp_path, monkeypatch):
    # reuse the CLI asset builder from test_cli
    from tests.test_cli import assets as _  # noqa: F401  (fixture import)
    pytest.importorskip("torch")
    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")

    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h"), ("ph", "o")])

    monkeypatch.setattr(
        sys, "argv",
        ["multitask", "--root", str(root),
         "--model_path", ckpt, "--bpe_path", merges,
         "--variant", "hard", "--height", "32", "--stride", "8",
         "--bs", "8", "--epochs_stage1", "1", "--epochs_stage2", "2",
         "--eval_every", "1", "--keep_best",
         "--log_dir", str(root / "logs"),
         "--save_path", str(root / "ck")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    # --eval_every / --keep_best runtime features work on multitask too
    import json

    recs = [json.loads(ln) for ln in
            (root / "logs" / "metrics.jsonl").read_text().splitlines()]
    evals = [r for r in recs if r["event"] == "eval"]
    assert [e["stage2_epoch"] for e in evals] == [1]
    bests = [r for r in recs if r["event"] == "best"]
    assert bests and bests[-1]["mAP"] == max(
        [e["mAP"] for e in evals] + [mAP]
    )


def test_multitask_cli_soft(tmp_path, monkeypatch):
    import sys

    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h")])

    monkeypatch.setattr(
        sys, "argv",
        ["multitask", "--root", str(root),
         "--model_path", ckpt, "--bpe_path", merges,
         "--variant", "soft", "--height", "32", "--stride", "8",
         "--bs", "8", "--epochs_stage1", "1", "--epochs_stage2", "1"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_mt_padded_batch_changes_nothing():
    """Multitask stage-2 step with a padded batch == the unpadded step:
    losses, gradients, BN stats, and XBM bank semantics all honor `valid`."""
    from tpu_reid.train import optim as O

    mcfg, params = build_mt("hard")
    tcfg = TrainConfig()
    trainable, frozen = O.partition(
        params, lambda p: MT.mt_stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    step = MT.make_mt_stage2_step(mcfg, tcfg, optimizer, task=0)
    text_features = MT.all_class_text_features_mt(params, mcfg, 0)

    rng = np.random.RandomState(7)
    k = 8
    images = rng.randn(k, 32, 16, 3).astype(np.float32)
    labels = np.repeat(rng.choice(5, k // 4, replace=False), 4)
    pad_img = np.concatenate(
        [images, 50.0 * rng.randn(4, 32, 16, 3).astype(np.float32)]
    )
    pad_lab = np.concatenate([labels, np.zeros(4, labels.dtype)])

    xbm0 = X.init_xbm(16, mcfg.clip.embed_dim)
    t_ref, f_ref, _, xbm_ref, loss_ref = step(
        trainable, frozen, optimizer.init(trainable),
        jnp.asarray(images), jnp.asarray(labels), text_features,
        xbm0, jnp.asarray(True), jnp.ones((k,), bool),
    )
    t_pad, f_pad, _, xbm_pad, loss_pad = step(
        trainable, frozen, optimizer.init(trainable),
        jnp.asarray(pad_img), jnp.asarray(pad_lab), text_features,
        xbm0, jnp.asarray(True), jnp.asarray(np.arange(12) < k),
    )
    assert abs(float(loss_ref) - float(loss_pad)) < 1e-4
    for a, b in zip(jax.tree.leaves(t_ref), jax.tree.leaves(t_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # padded rows are enqueued with label -1 and reported invalid
    _, lab_pad, valid_pad = X.xbm_get(xbm_pad)
    assert int(np.asarray(valid_pad).sum()) == k
    assert (np.asarray(lab_pad)[k:12] == -1).all()


@pytest.mark.fast
def test_mt_xbm_margin_matches_reference():
    """Both hard-sharing scripts use WeightedRegularizedTripletXBM(0.3) —
    a margin-ranking loss — not the soft-margin form (reference:
    ..._hard_sharing.py:574, ..._hard_sharing_ivlp.py:436)."""
    from tpu_reid.train import losses as L

    rng = np.random.RandomState(1)
    feat = rng.randn(8, 16).astype(np.float32)
    labels = np.repeat(np.arange(2), 4)
    bank = rng.randn(12, 16).astype(np.float32)
    bank_lab = rng.randint(0, 3, 12)
    margin03 = float(L.triplet_loss_xbm(
        jnp.asarray(feat), jnp.asarray(labels), jnp.asarray(bank),
        jnp.asarray(bank_lab), margin=0.3,
    ))
    # torch oracle: MarginRankingLoss(0.3)(d_an, d_ap, 1)
    import torch

    d = torch.cdist(torch.from_numpy(feat), torch.from_numpy(bank))
    is_pos = torch.from_numpy(labels)[:, None] == torch.from_numpy(bank_lab)[None, :]
    d_ap = d.masked_fill(~is_pos, -1e30).max(1).values
    d_an = d.masked_fill(is_pos, 1e30).min(1).values
    want = torch.nn.MarginRankingLoss(margin=0.3)(
        d_an, d_ap, torch.ones_like(d_an)
    )
    assert abs(margin03 - float(want)) < 1e-4


@pytest.mark.fast
def test_alternation_semantics():
    """alternate (AND) stops at the shorter iterator; alternate_longest /
    chain_tasks_longest (OR) drain both."""
    a = ["a1", "a2", "a3"]
    b = ["b1"]
    assert list(MT.alternate(a, b)) == [(0, "a1"), (1, "b1"), (0, "a2")]
    assert list(MT.alternate_longest(a, b)) == [
        (0, "a1"), (1, "b1"), (0, "a2"), (0, "a3")
    ]
    assert list(MT.chain_tasks(a, b)) == [(0, "a1"), (1, "b1")]
    assert list(MT.chain_tasks_longest(a, b)) == [
        (0, "a1"), (1, "b1"), (0, "a2"), (0, "a3")
    ]


def test_multitask_cli_soft_ivlp(tmp_path, monkeypatch):
    """soft + --training_mode ivlp: live stage-1 with per-dataset batch
    alternation and IVLP prompt geometry (reference soft multitask supports
    coop/promptsrc/ivlp/adapter via --training_mode,
    prompt_learning_multitask.py:730)."""
    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h")])

    monkeypatch.setattr(
        sys, "argv",
        ["multitask", "--root", str(root),
         "--model_path", ckpt, "--bpe_path", merges,
         "--variant", "soft", "--training_mode", "ivlp",
         "--height", "32", "--stride", "8",
         "--bs", "8", "--epochs_stage1", "2", "--epochs_stage2", "1"],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_mt_sharded_stage2_step_8dev():
    """Multitask stage-2 over the mesh (shard_map encoder + global-batch
    XBM/triplet semantics) equals the single-device step."""
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch
    from tpu_reid.train import optim as O

    mcfg, params = build_mt("hard")
    mesh = make_mesh()
    tcfg = TrainConfig()
    tf = MT.all_class_text_features_mt(params, mcfg, 0)
    trainable, frozen = O.partition(
        params, lambda p: MT.mt_stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    opt_state = optimizer.init(trainable)
    xbm = X.init_xbm(16, mcfg.clip.embed_dim)
    images, labels, valid = batches((32, 16), 5, n=1, bs=16)[0]
    valid = jnp.asarray(valid)

    step_m = MT.make_mt_stage2_step(mcfg, tcfg, optimizer, 0, mesh=mesh)
    tm, fm, om, xm, loss_m = step_m(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, opt_state), shard_batch(mesh, images),
        shard_batch(mesh, labels), replicate(mesh, tf),
        replicate(mesh, xbm), replicate(mesh, jnp.asarray(True)),
        shard_batch(mesh, valid),
    )
    step_1 = MT.make_mt_stage2_step(mcfg, tcfg, optimizer, 0)
    t1, f1, o1, x1, loss_1 = step_1(
        trainable, frozen, optimizer.init(trainable), images, labels, tf,
        xbm, jnp.asarray(True), valid,
    )
    assert abs(float(loss_m) - float(loss_1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(jax.tree.leaves(x1), jax.tree.leaves(xm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_mt_sharded_stage1_step_8dev():
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch
    from tpu_reid.train import optim as O

    mcfg, params = build_mt("hard_ivlp")
    mesh = make_mesh()
    tcfg = TrainConfig()
    trainable, frozen = O.partition(
        params, lambda p: MT.mt_stage1_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1, tcfg.weight_decay)
    images, labels, valid = batches((32, 16), 5, n=1, bs=16)[0]
    valid = jnp.asarray(valid)

    step_m = MT.make_mt_stage1_step(mcfg, optimizer, 0, mesh=mesh)
    tm, om, loss_m = step_m(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, optimizer.init(trainable)),
        shard_batch(mesh, images), shard_batch(mesh, labels),
        shard_batch(mesh, valid),
    )
    step_1 = MT.make_mt_stage1_step(mcfg, optimizer, 0)
    t1, o1, loss_1 = step_1(
        trainable, frozen, optimizer.init(trainable), images, labels, valid
    )
    assert abs(float(loss_m) - float(loss_1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_multitask_cli_resume(tmp_path, monkeypatch):
    """--resume on the hard variant: the final stage-2 checkpoint (params +
    optimizer state + GPA + XBM banks) restores and both stages are
    skipped, reproducing the first run's result (the reference multitask
    scripts can only save, ..._hard_sharing.py:676-681)."""
    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h")])

    argv = [
        "multitask", "--root", str(root),
        "--model_path", ckpt, "--bpe_path", merges,
        "--variant", "hard", "--height", "32", "--stride", "8",
        "--bs", "8", "--epochs_stage1", "1", "--epochs_stage2", "1",
        "--save_path", str(root / "ck"),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    cmc1, mAP1 = cli.main()
    monkeypatch.setattr(sys, "argv", argv + ["--resume"])
    cmc2, mAP2 = cli.main()
    assert abs(mAP1 - mAP2) < 1e-5


def test_mt_stage2_mid_resume_equals_straight_run():
    """Multitask exact resume: 2 epochs + (restore opt/GPA/XBM banks, 2
    more) must equal 4 straight epochs EXACTLY — including the XBM memory
    (xbm_start_epoch=0 so the banks shape every step's loss)."""
    mcfg, params = build_mt("hard")
    tcfg = TrainConfig()
    eps = {
        e: [(0, b0), (1, b1)]
        for e, (b0, b1) in enumerate(
            zip(
                [batches((32, 16), 5, n=1, bs=8, seed=300 + e)[0]
                 for e in range(4)],
                [batches((32, 16), 4, n=1, bs=8, seed=400 + e)[0]
                 for e in range(4)],
            )
        )
    }
    epoch_fn = lambda e: iter(eps[e])

    kw = dict(xbm_capacity=16, xbm_start_epoch=0, log=lambda s: None)
    want = MT.run_mt_stage2(params, mcfg, tcfg, epoch_fn, epochs=4, **kw)

    saved = {}

    class Interrupt(Exception):
        pass

    def cb(e, p, state):
        if e == 1:
            # deep-copy the XBM banks: the trainer rebinds list entries but
            # a later epoch of the interrupted run must not alias them
            saved.update(params=p, opt=state["opt_state"],
                         gpa=state["gpa"],
                         xbms=[jax.tree.map(jnp.array, x)
                               for x in state["xbms"]])
            raise Interrupt  # simulate a crash mid-run (same total epochs:
            # the GPA gaussian normalizes over the PLANNED epoch count)

    with pytest.raises(Interrupt):
        MT.run_mt_stage2(params, mcfg, tcfg, epoch_fn, epochs=4,
                         checkpoint_cb=cb, **kw)
    got = MT.run_mt_stage2(
        saved["params"], mcfg, tcfg, epoch_fn, epochs=4, start_epoch=2,
        init_opt_state=saved["opt"], init_gpa=saved["gpa"],
        init_xbms=saved["xbms"], **kw,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mt_stage1_mid_resume_equals_straight_run():
    """Same property for multitask stage 1 on the hard_ivlp variant, whose
    GPA accumulator must also carry across the resume."""
    mcfg, params = build_mt("hard_ivlp")
    tcfg = TrainConfig()
    eps = {
        e: [(0, batches((32, 16), 5, n=1, bs=8, seed=500 + e)[0]),
            (1, batches((32, 16), 4, n=1, bs=8, seed=600 + e)[0])]
        for e in range(1, 5)
    }
    epoch_fn = lambda e: iter(eps[e])

    want = MT.run_mt_stage1(params, mcfg, tcfg, epoch_fn, epochs=4,
                            log=lambda s: None)
    saved = {}

    class Interrupt(Exception):
        pass

    def cb(e, p, state):
        if e == 2:
            saved.update(params=p, opt=state["opt_state"], gpa=state["gpa"])
            raise Interrupt

    with pytest.raises(Interrupt):
        MT.run_mt_stage1(params, mcfg, tcfg, epoch_fn, epochs=4,
                         log=lambda s: None, checkpoint_cb=cb)
    got = MT.run_mt_stage1(
        saved["params"], mcfg, tcfg, epoch_fn, epochs=4, start_epoch=3,
        init_opt_state=saved["opt"], init_gpa=saved["gpa"],
        log=lambda s: None,
    )
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multitask_cli_devices(tmp_path, monkeypatch):
    """--devices 8 on the hard variant: both mt stages (per-task sharded
    steps) and extraction run over the 8-device CPU mesh in one CLI
    invocation, with batch placement owned by the trainers."""
    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h")])

    monkeypatch.setattr(
        sys, "argv",
        ["multitask", "--root", str(root),
         "--model_path", ckpt, "--bpe_path", merges,
         "--variant", "hard", "--height", "32", "--stride", "8",
         "--bs", "8", "--devices", "8",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--save_path", str(root / "ck")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0


def test_multitask_cli_cache_device(tmp_path, monkeypatch):
    """--cache_device on the hard multitask variant, sharded over a
    --devices 8 mesh: BOTH train splits stay HBM-resident (row-sharded
    over "data"), epochs serve batch-sharded gathers into the per-task
    sharded steps, XBM intact (VERDICT r4 #6)."""
    import json

    import torch
    from PIL import Image

    from tpu_reid.cli import multitask as cli
    from tpu_reid.models.tokenizer import write_test_merges

    root = tmp_path
    rng = np.random.RandomState(0)
    for name in ("Market1501", "DukeMTMC-reID"):
        base = root / name
        for sub in ("bounding_box_train", "query", "bounding_box_test"):
            (base / sub).mkdir(parents=True)
        for pid, cam, n in [(1, 1, 4), (2, 2, 4)]:
            for k in range(n):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_train" / f"{pid:04d}_c{cam}s1_{k:06d}_00.jpg")
        for pid in (1, 2):
            Image.fromarray(
                rng.randint(0, 255, (64, 32, 3), np.uint8)
            ).save(base / "query" / f"{pid:04d}_c2s1_000000_00.jpg")
            for k in range(2):
                Image.fromarray(
                    rng.randint(0, 255, (64, 32, 3), np.uint8)
                ).save(base / "bounding_box_test" / f"{pid:04d}_c{1 + k}s1_{k:06d}_00.jpg")
    sd = oracle.make_clip_state_dict(
        np.random.RandomState(1), vision_width=64, vision_layers=2, patch=8,
        grid=4, text_width=128, text_layers=2, vocab=520, context=77,
        embed_dim=32,
    )
    ckpt = str(root / "tiny.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    merges = str(root / "m.gz")
    write_test_merges(merges, [("p", "h")])

    monkeypatch.setattr(
        sys, "argv",
        ["multitask", "--root", str(root),
         "--model_path", ckpt, "--bpe_path", merges,
         "--variant", "hard", "--height", "32", "--stride", "8",
         "--bs", "8", "--devices", "8", "--cache_device",
         "--epochs_stage1", "1", "--epochs_stage2", "1",
         "--log_dir", str(root / "logs"),
         "--save_path", str(root / "ck")],
    )
    cmc, mAP = cli.main()
    assert 0.0 <= mAP <= 1.0
    recs = [json.loads(ln) for ln in
            (root / "logs" / "metrics.jsonl").read_text().splitlines()]
    cevents = [r for r in recs if r["event"] == "cache_device"]
    assert {c["dataset"] for c in cevents} == {"market1501", "dukemtmc"}
    assert all(c["sharded"] for c in cevents)
