"""End-to-end trainer tests on a tiny converted CLIP: stage-1/stage-2 update
the right parameter partitions, losses are finite and decrease, and the
sharded step runs over the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tests.torch_oracle as oracle
from tpu_reid.configs import PromptDesign
from tpu_reid.models import prompts as P
from tpu_reid.models import reid_clip as M
from tpu_reid.train import optim as O
from tpu_reid.train import trainer as TR
from tpu_reid.weights.convert import convert_clip

pytestmark = pytest.mark.slow  # train-step compiles are seconds each; three smokes stay fast

RNG = np.random.RandomState(0)


def tiny_model(mode="coop", n_cls=6, use_jpm=False, sie_ids=0):
    design = PromptDesign()
    if mode in ("ivlp", "promptsrc"):
        design = PromptDesign(trainer="IVLP", vision_depth=2, vision_ctx=2,
                              language_depth=2, language_ctx=2)
    sd = oracle.make_clip_state_dict(
        RNG, vision_width=64, vision_layers=2, patch=8, grid=4,
        text_width=128, text_layers=2, vocab=120, context=12, embed_dim=32,
    )
    ccfg, cparams = convert_clip(sd, image_hw=(32, 16), stride=8, design=design)
    if mode in ("ivlp", "promptsrc"):
        # converter leaves VPT uninitialized when absent from the checkpoint
        from tpu_reid.models.vit import init_vit
        from tpu_reid.models.text import init_text

        vinit = init_vit(jax.random.key(9), ccfg.vision)
        cparams["visual"]["vpt_shallow"] = vinit["vpt_shallow"]
        cparams["visual"]["vpt_deep"] = vinit["vpt_deep"]
        tinit = init_text(jax.random.key(10), ccfg.text)
        cparams["text"]["vpt_deep"] = tinit["vpt_deep"]

    pcfg = (P.PromptLearnerConfig.coop(n_cls) if mode in ("coop", "adapter")
            else P.PromptLearnerConfig.ivlp(n_cls))
    tokens = np.zeros((1, 12), np.int32)
    tokens[0, 0] = 118
    tokens[0, 1:10] = RNG.randint(1, 117, 9)
    tokens[0, 10] = 119
    temb = np.asarray(cparams["text"]["token_embedding"])[tokens]
    mcfg = M.ReidModelConfig(mode=mode, clip=ccfg, prompt=pcfg,
                             use_jpm=use_jpm, sie_ids=sie_ids)
    zs = None
    if mode == "promptsrc":
        zs = jax.tree.map(np.copy, cparams["visual"])
    params = M.init_reid_model(
        jax.random.key(0), mcfg, cparams, temb, tokens, zs_visual_params=zs
    )
    return mcfg, params


def fake_batches(n_batches=3, bs=8, n_cls=6, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        images = jnp.asarray(rng.randn(bs, 32, 16, 3).astype(np.float32))
        labels = jnp.asarray(np.repeat(rng.choice(n_cls, bs // 4, replace=False), 4))
        out.append((images, labels, np.ones(bs, bool)))
    return out


def leaves_equal(a, b):
    return all(
        np.allclose(x, y)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.fast
def test_partition_roundtrip():
    mcfg, params = tiny_model("coop")
    t, f = O.partition(params, lambda p: M.stage1_trainable(p, mcfg))
    full = O.combine(t, f)
    assert leaves_equal(full, params)
    # stage-1 coop trains exactly the cls_ctx
    assert O.count_params(t) == np.prod(params["prompt_learner"]["cls_ctx"].shape)


@pytest.mark.fast
def test_stage1_coop_cached():
    mcfg, params = tiny_model("coop")
    batches = fake_batches()
    before = np.asarray(params["prompt_learner"]["cls_ctx"]).copy()
    out = TR.run_stage1(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=3,
        log=lambda s: None,
    )
    assert not np.allclose(np.asarray(out["prompt_learner"]["cls_ctx"]), before)
    # everything else untouched
    assert leaves_equal(out["clip"], params["clip"])
    assert leaves_equal(out["head"], params["head"])


def test_stage1_ivlp_live():
    mcfg, params = tiny_model("ivlp")
    batches = fake_batches()
    out = TR.run_stage1(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=2,
        log=lambda s: None,
    )
    # VPT tokens train in stage 1 for ivlp
    assert not np.allclose(
        np.asarray(out["clip"]["visual"]["vpt_shallow"]),
        np.asarray(params["clip"]["visual"]["vpt_shallow"]),
    )
    assert leaves_equal(
        out["clip"]["visual"]["blocks"], params["clip"]["visual"]["blocks"]
    )


def test_stage2_updates_encoder_freezes_prompts():
    mcfg, params = tiny_model("coop")
    batches = fake_batches()
    losses = []
    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=2,
        log=lambda s: losses.append(s),
    )
    assert not leaves_equal(
        out["clip"]["visual"]["blocks"], params["clip"]["visual"]["blocks"]
    )
    assert leaves_equal(out["prompt_learner"], params["prompt_learner"])
    # BNNeck bias frozen at zero, running stats updated
    np.testing.assert_array_equal(np.asarray(out["head"]["bn"]["bias"]), 0)
    assert not np.allclose(
        np.asarray(out["head"]["bn"]["mean"]),
        np.asarray(params["head"]["bn"]["mean"]),
    )


def test_stage2_promptsrc_distill_and_gpa():
    mcfg, params = tiny_model("promptsrc")
    batches = fake_batches()
    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=2,
        log=lambda s: None,
    )
    # ZS teacher untouched
    assert leaves_equal(out["zs_visual"], params["zs_visual"])


def test_stage2_adapter_mode():
    mcfg, params = tiny_model("adapter")
    batches = fake_batches()
    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=1,
        log=lambda s: None,
    )
    assert not leaves_equal(out["adapter"], params["adapter"])


def test_eval_embed_shape():
    mcfg, params = tiny_model("coop")
    images = jnp.zeros((4, 32, 16, 3))
    emb = M.eval_embed(params, mcfg, images)
    assert emb.shape == (4, 64 + 32)  # non_proj width + proj dim


def test_stage2_jpm_branch():
    """use_jpm wiring: the jigsaw branch is a 4th feature level — stage 2
    trains its block copy and ID head, threads its BNNeck running stats,
    keeps its BN bias frozen at zero, and eval_embed concatenates the JPM
    CLS. (The reference defines the JPM tower but never instantiates it —
    reference: coop.py:230-277, jpm.py.)"""
    mcfg, params = tiny_model("coop", use_jpm=True)
    images = jnp.asarray(np.random.RandomState(3).randn(4, 32, 16, 3),
                         jnp.float32)

    # forward contract: 3 cls_scores, 4 features, jpm bn stats present
    out = M.forward_train(params, mcfg, images, train=True)
    assert len(out["cls_scores"]) == 3
    assert len(out["features"]) == 4
    assert out["features"][3].shape == (4, 64)
    assert out["bn_stats"]["jpm"] is not None

    # jpm branch differs from the plain x12 CLS (the shuffle + block copy
    # does real work)
    feats = M.encode_image_features(params, mcfg, images)
    assert not np.allclose(np.asarray(feats["jpm"]),
                           np.asarray(feats["non_proj"]), atol=1e-3)

    emb = M.eval_embed(params, mcfg, images)
    assert emb.shape == (4, 64 + 32 + 64)

    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(fake_batches()),
        epochs=1, log=lambda s: None,
    )
    assert not leaves_equal(out["jpm"], params["jpm"])
    assert not leaves_equal(out["jpm_head"]["cls"], params["jpm_head"]["cls"])
    np.testing.assert_array_equal(
        np.asarray(out["jpm_head"]["bn"]["bias"]), 0
    )
    assert not np.allclose(
        np.asarray(out["jpm_head"]["bn"]["mean"]),
        np.asarray(params["jpm_head"]["bn"]["mean"]),
    )
    # stage 1 leaves the jpm branch untouched (text-side training only)
    s1 = TR.run_stage1(
        params, mcfg, TR.TrainConfig(), lambda e: iter(fake_batches()),
        epochs=1, log=lambda s: None,
    )
    assert leaves_equal(s1["jpm"], params["jpm"])
    assert leaves_equal(s1["jpm_head"], params["jpm_head"])


def test_sie_camera_embedding():
    """sie_ids wiring (SIE, CLIP-ReID-style): camera ids shift the CLS
    token through a learned embedding — different camids give different
    embeddings, out-of-range ids clamp, stage 2 trains the table and
    stage 1 leaves it frozen. (Every reference tower accepts the cv_emb
    hook but no reference entry point feeds it — coop.py:210-211.)"""
    mcfg, params = tiny_model("coop", sie_ids=3)
    assert params["sie_embed"].shape == (3, 64)
    images = jnp.asarray(np.random.RandomState(5).randn(4, 32, 16, 3),
                         jnp.float32)
    cv0 = jnp.zeros((4,), jnp.int32)
    cv1 = jnp.ones((4,), jnp.int32)
    e0 = M.eval_embed(params, mcfg, images, cv_ids=cv0)
    e1 = M.eval_embed(params, mcfg, images, cv_ids=cv1)
    assert not np.allclose(np.asarray(e0), np.asarray(e1), atol=1e-4)
    # unseen eval camera ids clamp to the last row instead of crashing
    e_clamp = M.eval_embed(params, mcfg, images,
                           cv_ids=jnp.full((4,), 99, jnp.int32))
    e_last = M.eval_embed(params, mcfg, images,
                          cv_ids=jnp.full((4,), 2, jnp.int32))
    np.testing.assert_allclose(np.asarray(e_clamp), np.asarray(e_last))

    def batches_with_cams(n_batches=3, bs=8, seed=0):
        rng = np.random.RandomState(seed)
        out = []
        for _ in range(n_batches):
            images = jnp.asarray(rng.randn(bs, 32, 16, 3).astype(np.float32))
            labels = jnp.asarray(
                np.repeat(rng.choice(6, bs // 4, replace=False), 4))
            cams = jnp.asarray(rng.randint(0, 3, bs), jnp.int32)
            out.append((images, labels, np.ones(bs, bool), cams))
        return out

    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches_with_cams()),
        epochs=1, log=lambda s: None,
    )
    assert not leaves_equal(out["sie_embed"], params["sie_embed"])
    # stage 1 (cached coop path consumes the 4-tuple batches) freezes SIE
    s1 = TR.run_stage1(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches_with_cams()),
        epochs=1, log=lambda s: None,
    )
    assert leaves_equal(s1["sie_embed"], params["sie_embed"])


def test_jpm_sie_compose():
    """--jpm and --sie_camera compose: the SIE offset feeds the CLS token
    the jigsaw branch re-processes, and stage-2 trains both additions in
    one step."""
    mcfg, params = tiny_model("coop", use_jpm=True, sie_ids=3)
    images = jnp.asarray(np.random.RandomState(4).randn(4, 32, 16, 3),
                         jnp.float32)
    cv = jnp.asarray([0, 1, 2, 0], jnp.int32)
    out = M.forward_train(params, mcfg, images, train=True, cv_ids=cv)
    assert len(out["cls_scores"]) == 3 and len(out["features"]) == 4
    emb = M.eval_embed(params, mcfg, images, cv_ids=cv)
    assert emb.shape == (4, 64 + 32 + 64)
    # the camera id reaches the jigsaw branch too (JPM consumes the CLS
    # token the SIE offset shifted)
    emb2 = M.eval_embed(params, mcfg, images,
                        cv_ids=jnp.asarray([1, 0, 0, 1], jnp.int32))
    jpm_slice = np.asarray(emb[:, 96:]), np.asarray(emb2[:, 96:])
    assert not np.allclose(*jpm_slice, atol=1e-4)

    def batches(n=2, bs=8):
        rng = np.random.RandomState(1)
        return [(jnp.asarray(rng.randn(bs, 32, 16, 3).astype(np.float32)),
                 jnp.asarray(np.repeat(rng.choice(6, bs // 4, False), 4)),
                 np.ones(bs, bool),
                 jnp.asarray(rng.randint(0, 3, bs), jnp.int32))
                for _ in range(n)]

    out = TR.run_stage2(params, mcfg, TR.TrainConfig(),
                        lambda e: iter(batches()), epochs=1,
                        log=lambda s: None)
    assert not leaves_equal(out["jpm"], params["jpm"])
    assert not leaves_equal(out["sie_embed"], params["sie_embed"])


def test_stage1_loss_decreases():
    mcfg, params = tiny_model("coop")
    batches = fake_batches(n_batches=2, bs=16)
    msgs = []
    TR.run_stage1(
        params, mcfg, TR.TrainConfig(lr_stage1=5e-3), lambda e: iter(batches),
        epochs=30, log=msgs.append,
    )
    losses = [float(m.split("loss ")[1].split(" ")[0]) for m in msgs]
    assert min(losses[5:]) < losses[0] - 0.01


def test_sharded_stage2_step_8dev():
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mcfg, params = tiny_model("coop")
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tcfg = TR.TrainConfig()
    text_features = M.all_class_text_features(params, mcfg)
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    opt_state = optimizer.init(trainable)
    step = TR.make_stage2_step(mcfg, tcfg, optimizer, mesh=mesh)

    images, labels, _ = fake_batches(1, bs=16)[0]
    t2, f2, opt_state, loss = step(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, opt_state),
        shard_batch(mesh, images), shard_batch(mesh, labels),
        replicate(mesh, text_features),
        shard_batch(mesh, jnp.ones((16,), bool)),
    )
    assert np.isfinite(float(loss))
    # sharded result equals the single-device step (global-batch semantics)
    step1 = TR.make_stage2_step(mcfg, tcfg, optimizer)
    t1, f1, _, loss1 = step1(
        trainable, frozen, optimizer.init(trainable), images, labels,
        text_features,
    )
    assert abs(float(loss) - float(loss1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_stage2_step_sie_8dev():
    """SIE camera ids shard with the batch: the mesh step's loss and
    updated params equal the single-device step's (global-batch
    semantics hold with the extra cv_ids argument)."""
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mcfg, params = tiny_model("coop", sie_ids=4)
    mesh = make_mesh()
    tcfg = TR.TrainConfig()
    text_features = M.all_class_text_features(params, mcfg)
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    opt_state = optimizer.init(trainable)
    images, labels, _ = fake_batches(1, bs=16)[0]
    cams = jnp.asarray(np.random.RandomState(2).randint(0, 4, 16), jnp.int32)

    step = TR.make_stage2_step(mcfg, tcfg, optimizer, mesh=mesh)
    t2, _, _, loss = step(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, opt_state),
        shard_batch(mesh, images), shard_batch(mesh, labels),
        replicate(mesh, text_features),
        shard_batch(mesh, jnp.ones((16,), bool)),
        shard_batch(mesh, cams),
    )
    step1 = TR.make_stage2_step(mcfg, tcfg, optimizer)
    t1, _, _, loss1 = step1(
        trainable, frozen, optimizer.init(trainable), images, labels,
        text_features, jnp.ones((16,), bool), cams,
    )
    assert abs(float(loss) - float(loss1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the SIE table itself received a (matching) update on both paths
    assert not leaves_equal(t1["sie_embed"], trainable["sie_embed"])


def test_maple_mode():
    """MaPLe: shared text ctx + deeper prompts projected into the vision
    tower; coupling params train in stage 1 and freeze in stage 2."""
    from tpu_reid.configs import PromptDesign

    design = PromptDesign(trainer="MaPLe", vision_depth=2, vision_ctx=2,
                          language_depth=2, language_ctx=2, maple_length=2)
    sd = oracle.make_clip_state_dict(
        RNG, vision_width=64, vision_layers=2, patch=8, grid=4,
        text_width=128, text_layers=2, vocab=120, context=12, embed_dim=32,
    )
    ccfg, cparams = convert_clip(sd, image_hw=(32, 16), stride=8,
                                 design=design)
    pcfg = P.PromptLearnerConfig.ivlp(4)
    tokens = np.zeros((1, 12), np.int32)
    tokens[0, 0] = 118
    tokens[0, 1:10] = RNG.randint(1, 117, 9)
    tokens[0, 10] = 119
    temb = np.asarray(cparams["text"]["token_embedding"])[tokens]
    mcfg = M.ReidModelConfig(mode="maple", clip=ccfg, prompt=pcfg)
    params = M.init_reid_model(jax.random.key(0), mcfg, cparams, temb, tokens)
    assert "maple" in params
    assert params["maple"]["proj"]["w"].shape == (2, 128, 64)

    # vision output depends on the coupling: perturb -> features move.
    # NOTE: the perturbation must be non-constant per channel — a constant
    # offset on a prompt token is LayerNorm-invariant and cannot propagate
    # through attention.
    images = jnp.asarray(RNG.randn(2, 32, 16, 3).astype(np.float32))
    e1 = M.eval_embed(params, mcfg, images)
    noise_key = jax.random.key(42)
    p2 = jax.tree.map(lambda x: x, params)
    p2["maple"] = jax.tree.map(
        lambda x: x + 0.2 * jax.random.normal(noise_key, x.shape, x.dtype),
        params["maple"],
    )
    e2 = M.eval_embed(p2, mcfg, images)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
    # text path consumes the deeper text prompts
    t1 = M.encode_text_features(params, mcfg, jnp.array([1]))
    t2 = M.encode_text_features(p2, mcfg, jnp.array([1]))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))

    # stage-1 trains maple + cls_ctx; stage-2 freezes both
    batches = fake_batches(n_cls=4)
    out = TR.run_stage1(params, mcfg, TR.TrainConfig(),
                        lambda e: iter(batches), epochs=1, log=lambda s: None)
    assert not np.allclose(np.asarray(out["maple"]["shared_ctx"]),
                           np.asarray(params["maple"]["shared_ctx"]))
    out2 = TR.run_stage2(out, mcfg, TR.TrainConfig(),
                         lambda e: iter(batches), epochs=1, log=lambda s: None)
    np.testing.assert_allclose(np.asarray(out2["maple"]["shared_ctx"]),
                               np.asarray(out["maple"]["shared_ctx"]))


def test_sharded_extractor_8dev():
    """shard_map extraction over the 8-device CPU mesh matches unsharded."""
    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.parallel.extract import make_extractor
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mcfg, params = tiny_model("coop")
    mesh = make_mesh()
    pp = DevicePreprocess((32, 16), "vit")
    embed = lambda p, im: M.eval_embed(p, mcfg, im)
    ex_sharded = make_extractor(embed, pp, mesh=mesh, flip_tta=True,
                                dtype=jnp.float32)
    ex_plain = make_extractor(embed, pp, flip_tta=True, dtype=jnp.float32)
    images = np.random.RandomState(0).randint(
        0, 255, (16, 32, 16, 3), np.uint8
    )
    f_sharded = ex_sharded(
        replicate(mesh, params), shard_batch(mesh, jnp.asarray(images))
    )
    f_plain = ex_plain(params, jnp.asarray(images))
    np.testing.assert_allclose(
        np.asarray(f_sharded), np.asarray(f_plain), atol=2e-5, rtol=1e-4
    )


def test_stage2_text_tower_not_decayed():
    """Stage 2 precomputes text features, so the text tower receives no
    gradient; it must not drift through Adam's coupled weight decay either
    (the reference's torch Adam skips grad-less params)."""
    mcfg, params = tiny_model("coop")
    batches = fake_batches()
    out = TR.run_stage2(
        params, mcfg, TR.TrainConfig(), lambda e: iter(batches), epochs=2,
        log=lambda s: None,
    )
    assert leaves_equal(out["clip"]["text"], params["clip"]["text"])
    np.testing.assert_allclose(
        np.asarray(out["clip"]["logit_scale"]),
        np.asarray(params["clip"]["logit_scale"]),
    )


def test_padded_batch_changes_nothing_stage2():
    """A padded tail batch (valid mask) must produce exactly the update the
    unpadded batch would: losses honor `valid` and the BNNeck batch stats
    exclude padded rows (reference semantics = torch's ragged tail batch)."""
    mcfg, params = tiny_model("coop")
    tcfg = TR.TrainConfig()
    text_features = M.all_class_text_features(params, mcfg)
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    step = TR.make_stage2_step(mcfg, tcfg, optimizer)

    rng = np.random.RandomState(3)
    k = 8
    images = rng.randn(k, 32, 16, 3).astype(np.float32)
    labels = np.repeat(rng.choice(6, k // 4, replace=False), 4)
    # padded variant: 4 garbage rows appended, masked invalid
    pad_img = np.concatenate(
        [images, 100.0 * rng.randn(4, 32, 16, 3).astype(np.float32)]
    )
    pad_lab = np.concatenate([labels, np.zeros(4, labels.dtype)])
    valid = np.arange(12) < k

    t_ref, f_ref, _, loss_ref = step(
        trainable, frozen, optimizer.init(trainable),
        jnp.asarray(images), jnp.asarray(labels), text_features,
        jnp.ones((k,), bool),
    )
    t_pad, f_pad, _, loss_pad = step(
        trainable, frozen, optimizer.init(trainable),
        jnp.asarray(pad_img), jnp.asarray(pad_lab), text_features,
        jnp.asarray(valid),
    )
    assert abs(float(loss_ref) - float(loss_pad)) < 1e-4
    for a, b in zip(jax.tree.leaves(t_ref), jax.tree.leaves(t_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # BN running stats identical too (padded rows excluded from batch stats)
    for name in ("bn", "bn_proj"):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(f_ref["head"][name][stat]),
                np.asarray(f_pad["head"][name][stat]), atol=1e-4,
            )


def test_padded_batch_changes_nothing_stage1_live():
    """Same invariance for the live (ivlp) stage-1 SupCon step."""
    mcfg, params = tiny_model("ivlp")
    tcfg = TR.TrainConfig()
    trainable, frozen = O.partition(
        params, lambda p: M.stage1_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1)
    step = TR.make_stage1_step(mcfg, optimizer, cached=False)

    rng = np.random.RandomState(4)
    k = 8
    images = rng.randn(k, 32, 16, 3).astype(np.float32)
    labels = np.repeat(rng.choice(6, k // 4, replace=False), 4)
    pad_img = np.concatenate(
        [images, 100.0 * rng.randn(4, 32, 16, 3).astype(np.float32)]
    )
    pad_lab = np.concatenate([labels, np.zeros(4, labels.dtype)])

    t_ref, _, loss_ref = step(
        trainable, frozen, optimizer.init(trainable),
        {"images": jnp.asarray(images), "labels": jnp.asarray(labels),
         "valid": jnp.ones((k,), bool)},
    )
    t_pad, _, loss_pad = step(
        trainable, frozen, optimizer.init(trainable),
        {"images": jnp.asarray(pad_img), "labels": jnp.asarray(pad_lab),
         "valid": jnp.asarray(np.arange(12) < k)},
    )
    assert abs(float(loss_ref) - float(loss_pad)) < 1e-4
    for a, b in zip(jax.tree.leaves(t_ref), jax.tree.leaves(t_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_stage1_live_step_8dev():
    """ivlp live stage-1 over the mesh: the encoder runs inside shard_map
    (per-device local batches -> fused-kernel-capable) while the SupCon
    mining stays global — loss and updated params must equal the
    single-device step."""
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mcfg, params = tiny_model("ivlp")
    mesh = make_mesh()
    tcfg = TR.TrainConfig()
    trainable, frozen = O.partition(
        params, lambda p: M.stage1_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage1, tcfg.weight_decay)
    opt_state = optimizer.init(trainable)
    images, labels, valid = fake_batches(1, bs=16)[0]
    batch = {"images": images, "labels": labels,
             "valid": jnp.asarray(valid)}

    step_m = TR.make_stage1_step(mcfg, optimizer, cached=False, mesh=mesh)
    tm, _, loss_m = step_m(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, opt_state),
        {"images": shard_batch(mesh, images),
         "labels": shard_batch(mesh, labels),
         "valid": shard_batch(mesh, jnp.asarray(valid))},
    )
    step_1 = TR.make_stage1_step(mcfg, optimizer, cached=False)
    t1, _, loss_1 = step_1(trainable, frozen, optimizer.init(trainable), batch)
    assert abs(float(loss_m) - float(loss_1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_stage2_promptsrc_8dev():
    """promptsrc stage 2 over the mesh: the frozen ZS teacher encode runs
    inside the shard_map too; distill term included, parity vs single."""
    from tpu_reid.parallel.mesh import make_mesh, replicate, shard_batch

    mcfg, params = tiny_model("promptsrc")
    mesh = make_mesh()
    tcfg = TR.TrainConfig()
    text_features = M.all_class_text_features(params, mcfg)
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    opt_state = optimizer.init(trainable)
    images, labels, _ = fake_batches(1, bs=16)[0]

    step_m = TR.make_stage2_step(mcfg, tcfg, optimizer, mesh=mesh)
    tm, fm, _, loss_m = step_m(
        replicate(mesh, trainable), replicate(mesh, frozen),
        replicate(mesh, opt_state),
        shard_batch(mesh, images), shard_batch(mesh, labels),
        replicate(mesh, text_features),
        shard_batch(mesh, jnp.ones((16,), bool)),
    )
    step_1 = TR.make_stage2_step(mcfg, tcfg, optimizer)
    t1, f1, _, loss_1 = step_1(
        trainable, frozen, optimizer.init(trainable), images, labels,
        text_features, jnp.ones((16,), bool),
    )
    assert abs(float(loss_m) - float(loss_1)) < 1e-4
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_stage2_mid_resume_equals_straight_run():
    """Resume with optimizer state: 2 epochs + (restore, 2 more) must equal
    4 straight epochs EXACTLY — Adam moments carry the trajectory
    (the reference cannot resume at all, SURVEY.md §5)."""
    mcfg, params = tiny_model("coop")
    tcfg = TR.TrainConfig()
    batches = {e: fake_batches(2, bs=8, seed=100 + e) for e in range(4)}
    epoch_fn = lambda e: iter(batches[e])

    want = TR.run_stage2(params, mcfg, tcfg, epoch_fn, epochs=4,
                         log=lambda s: None)

    saved = {}

    def cb(e, p, state):
        if e == 1:
            saved["params"] = p
            saved["opt"] = state["opt_state"]

    TR.run_stage2(params, mcfg, tcfg, epoch_fn, epochs=2,
                  log=lambda s: None, checkpoint_cb=cb)
    got = TR.run_stage2(saved["params"], mcfg, tcfg, epoch_fn, epochs=4,
                        log=lambda s: None, start_epoch=2,
                        init_opt_state=saved["opt"])
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_stage1_mid_resume_equals_straight_run():
    """Same property for the stage-1 live (ivlp) path, including GPA-free
    trajectory equality."""
    mcfg, params = tiny_model("ivlp")
    tcfg = TR.TrainConfig()
    batches = {e: fake_batches(2, bs=8, seed=200 + e) for e in range(1, 5)}
    epoch_fn = lambda e: iter(batches[e])

    want = TR.run_stage1(params, mcfg, tcfg, epoch_fn, epochs=4,
                         log=lambda s: None)
    saved = {}

    def cb(e, p, state):
        if e == 2:
            saved["params"] = p
            saved["opt"] = state["opt_state"]

    TR.run_stage1(params, mcfg, tcfg, epoch_fn, epochs=2,
                  log=lambda s: None, checkpoint_cb=cb)
    got = TR.run_stage1(saved["params"], mcfg, tcfg, epoch_fn, epochs=4,
                        log=lambda s: None, start_epoch=3,
                        init_opt_state=saved["opt"])
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_stage2_cached_chunked_equals_host_loop():
    """run_stage2_cached (chunk-of-steps lax.scan serving from the
    HBM-resident cache) must reproduce the host-driven run_stage2 loop
    fed the same gathers/RNG stream — same losses, same final params
    (r5; the chunked path exists because per-step dispatch overhead
    through a remote link dwarfs step compute)."""
    from tpu_reid.data.device_cache import DeviceImageCache
    from tpu_reid.data.sampler import PKSampler
    from tpu_reid.data.transforms import DevicePreprocess

    mcfg, params = tiny_model("coop", n_cls=6)
    N, B = 40, 8
    imgs = RNG.randint(0, 255, (N, 32, 16, 3), np.uint8)
    pids = np.asarray([i % 6 for i in range(N)], np.int32)
    camids = np.zeros((N,), np.int32)

    class FakeCache:
        images = jnp.asarray(imgs)
        n = N
        epoch_index_batches = DeviceImageCache.epoch_index_batches

    cache = FakeCache()
    cache.pids, cache.camids = pids, camids
    pp = DevicePreprocess((32, 16), "vit", dtype=jnp.float32)
    key = jax.random.key(0)
    tcfg = TR.TrainConfig(epochs_stage2=2)

    def order(epoch):
        sampler = PKSampler(list(pids), B, 4, seed=epoch)
        return cache.epoch_index_batches(sampler.epoch(), B)

    def host_batches(epoch):
        k = jax.random.fold_in(key, 10_000 + epoch)
        for i, (sel, p_, _c, v) in enumerate(order(epoch)):
            im = pp.train_batch(
                jnp.take(cache.images, jnp.asarray(sel), axis=0),
                jax.random.fold_in(k, i), pad_hw=(10, 10),
            )
            yield im, jnp.asarray(p_), v

    logs_a, logs_b = [], []
    out_a = TR.run_stage2(params, mcfg, tcfg, host_batches, epochs=2,
                          log=logs_a.append)
    out_b = TR.run_stage2_cached(params, mcfg, tcfg, cache, order, pp, key,
                                 epochs=2, chunk=3, log=logs_b.append)
    # same per-epoch mean losses (chunk=3 pads the 5-step epochs -> the
    # padded step must be skipped, not averaged in)
    assert logs_a == logs_b
    la = jax.tree.leaves(out_a)
    lb = jax.tree.leaves(out_b)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-5, rtol=2e-4)


def test_stage1_live_cached_chunked_equals_host_loop():
    """run_stage1_live_cached (chunked scan serving live ivlp stage 1 from
    the image cache) == run_stage1 fed the same gathered batches (r5)."""
    from tpu_reid.data.device_cache import DeviceImageCache
    from tpu_reid.data.transforms import DevicePreprocess

    mcfg, params = tiny_model("ivlp", n_cls=6)
    N, B = 30, 8
    imgs = RNG.randint(0, 255, (N, 32, 16, 3), np.uint8)
    pids = np.asarray([i % 6 for i in range(N)], np.int32)

    class FakeCache:
        images = jnp.asarray(imgs)
        n = N
        epoch_index_batches = DeviceImageCache.epoch_index_batches

    cache = FakeCache()
    cache.pids, cache.camids = pids, np.zeros((N,), np.int32)
    pp = DevicePreprocess((32, 16), "vit", dtype=jnp.float32)
    tcfg = TR.TrainConfig(epochs_stage1=2)

    def order(epoch):
        rng = np.random.default_rng(7 + epoch)
        return cache.epoch_index_batches(rng.permutation(N), B,
                                         drop_tail=True)

    def host_batches(epoch):
        for sel, p_, _c, v in order(epoch):
            yield (pp.eval_batch(jnp.take(cache.images,
                                          jnp.asarray(sel), axis=0)),
                   jnp.asarray(p_), v)

    logs_a, logs_b = [], []
    out_a = TR.run_stage1(params, mcfg, tcfg, host_batches, epochs=2,
                          log=logs_a.append)
    out_b = TR.run_stage1_live_cached(params, mcfg, tcfg, cache, order, pp,
                                      epochs=2, chunk=2, log=logs_b.append)
    assert logs_a == logs_b
    for a, b in zip(jax.tree.leaves(out_a), jax.tree.leaves(out_b)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-5, rtol=2e-4)
