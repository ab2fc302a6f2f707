"""Weight converter + tower parity vs an independent torch oracle."""

import numpy as np
import pytest
import tests.torch_oracle as oracle

import jax.numpy as jnp

from tpu_reid.configs import PromptDesign
from tpu_reid.models import text as T
from tpu_reid.models import vit as V
from tpu_reid.models.clip_model import resize_pos_embed
from tpu_reid.weights.convert import convert_clip, merge_pretrained

RNG = np.random.RandomState(0)
SD = oracle.make_clip_state_dict(RNG)


def test_infer_config_vit():
    cfg, params = convert_clip(SD, image_hw=(32, 32), stride=8)
    assert cfg.vision.layers == 3
    assert cfg.vision.width == 64
    assert cfg.vision.patch_size == 8
    assert cfg.vision.h_grid == cfg.vision.w_grid == 4
    assert cfg.text.layers == 2
    assert cfg.text.vocab_size == 100
    assert cfg.embed_dim == 24
    assert params["visual"]["conv"]["w"].shape == (8, 8, 3, 64)


@pytest.mark.slow
def test_vit_parity_square():
    cfg, params = convert_clip(SD, image_hw=(32, 32), stride=8)
    images = RNG.randn(2, 32, 32, 3).astype(np.float32)
    x11, x12, xproj = V.apply_vit(
        params["visual"], cfg.vision, jnp.asarray(images)
    )
    o11, o12, oproj = oracle.vit_forward(
        SD, images.transpose(0, 3, 1, 2), stride=8, n_layers=3, n_heads=1
    )
    np.testing.assert_allclose(np.asarray(x11), o11, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(x12), o12, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(xproj), oproj, atol=2e-4, rtol=1e-3)


def test_vit_parity_rect_overlapping_stride():
    """Rectangular input + overlapping patches: pos-embed resized 4x4 -> 5x2,
    conv stride 6 < patch 8 (the ReID configuration shape)."""
    cfg, params = convert_clip(SD, image_hw=(32, 14), stride=6)
    assert (cfg.vision.h_grid, cfg.vision.w_grid) == (5, 2)
    images = RNG.randn(2, 32, 14, 3).astype(np.float32)
    x11, x12, xproj = V.apply_vit(
        params["visual"], cfg.vision, jnp.asarray(images)
    )
    # oracle with the resized pos embed substituted in
    sd2 = dict(SD)
    sd2["visual.positional_embedding"] = resize_pos_embed(
        SD["visual.positional_embedding"], 5, 2
    )
    o11, o12, oproj = oracle.vit_forward(
        sd2, images.transpose(0, 3, 1, 2), stride=6, n_layers=3, n_heads=1
    )
    np.testing.assert_allclose(np.asarray(xproj), oproj, atol=2e-4, rtol=1e-3)


def test_text_parity():
    cfg, params = convert_clip(SD, image_hw=(32, 32), stride=8)
    tokens = np.zeros((3, 16), np.int32)
    for i in range(3):
        ln = RNG.randint(3, 15)
        tokens[i, :ln] = RNG.randint(1, 98, ln)
        tokens[i, ln] = 99  # EOT = largest id
    feats = T.encode_text_tokens(params["text"], cfg.text, jnp.asarray(tokens))
    ofeats = oracle.text_forward(SD, tokens, n_layers=2, n_heads=2)
    np.testing.assert_allclose(np.asarray(feats), ofeats, atol=2e-4, rtol=1e-3)


def test_resize_pos_embed_matches_torch_bicubic():
    import torch
    import torch.nn.functional as F

    grid = RNG.randn(1 + 16, 8).astype(np.float32)
    ours = resize_pos_embed(grid, 7, 3)
    g = torch.from_numpy(grid[1:].reshape(4, 4, 8)).permute(2, 0, 1)[None]
    ref = F.interpolate(g, size=(7, 3), mode="bicubic", align_corners=False)
    ref = ref[0].permute(1, 2, 0).reshape(21, 8).numpy()
    np.testing.assert_allclose(ours[1:], ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(ours[0], grid[0])


def test_merge_pretrained_shape_tolerant():
    base = {"a": np.zeros((2, 2)), "nest": {"b": np.zeros(3), "c": np.zeros(4)}}
    upd = {"a": np.ones((2, 2)), "nest": {"b": np.ones(5)}}  # b mismatches
    out = merge_pretrained(base, upd)
    np.testing.assert_array_equal(out["a"], 1)
    np.testing.assert_array_equal(out["nest"]["b"], 0)  # skipped
    np.testing.assert_array_equal(out["nest"]["c"], 0)  # untouched


def test_ivlp_vpt_keys_consumed():
    sd = dict(SD)
    sd["visual.VPT"] = RNG.randn(2, 64).astype(np.float32)
    for i in (1, 2):
        sd[f"visual.transformer.resblocks.{i}.VPT_shallow"] = RNG.randn(
            2, 64
        ).astype(np.float32)
    design = PromptDesign(trainer="IVLP", vision_depth=3, vision_ctx=2,
                          language_depth=0, language_ctx=0)
    cfg, params = convert_clip(sd, image_hw=(32, 32), stride=8, design=design)
    assert params["visual"]["vpt_shallow"].shape == (2, 64)
    assert params["visual"]["vpt_deep"].shape == (3, 2, 64)
    np.testing.assert_array_equal(
        params["visual"]["vpt_deep"][1],
        sd["visual.transformer.resblocks.1.VPT_shallow"],
    )


@pytest.mark.slow
def test_rn50_conversion_and_forward():
    """RN checkpoint: shape inference, weight mapping, zero-shot embed."""
    rng = np.random.RandomState(3)
    sd = oracle.make_rn50_state_dict(rng)
    cfg, params = convert_clip(sd, image_hw=(64, 32))
    assert cfg.vision is None and cfg.resnet is not None
    assert cfg.resnet.width == 16
    assert cfg.resnet.layers == (1, 1, 1, 1)
    # layer4 stride 1 (ReID variant) -> /16 grid
    assert (cfg.resnet.h_grid, cfg.resnet.w_grid) == (4, 2)
    # attnpool pos embed resized from the square 2x2 grid to 4x2
    assert params["visual"]["attnpool"]["positional_embedding"].shape == (
        9, 16 * 32,
    )

    from tpu_reid.models import resnet as R

    images = rng.randn(2, 64, 32, 3).astype(np.float32)
    x3, x4, xproj = R.apply_resnet(params["visual"], cfg.resnet,
                                   jnp.asarray(images))
    assert x4.shape == (2, 4, 2, 16 * 8 * 4)
    assert xproj.shape == (2, 9, 24)
    assert np.isfinite(np.asarray(xproj)).all()

    # zero-shot RN embedding head: avg-pooled map + attention-pooled token
    from tpu_reid.pipelines.zero_shot import make_zeroshot_embed

    embed = make_zeroshot_embed(params, cfg)
    e = embed(params, jnp.asarray(images))
    assert e.shape == (2, 16 * 8 * 4 + 24)


@pytest.mark.slow
def test_rn50x4_shaped_conversion_and_forward():
    """RN50x4-shaped checkpoint (true width/depth ratios, reduced scale):
    heterogeneous stage depths (4, 6, 10, 6), width not a power-of-two
    multiple of 64, embed_dim != width*16. The reference ships RN50x4
    (clip_custom.py:26-34); `infer_config` must recover the geometry from
    shapes alone."""
    rng = np.random.RandomState(7)
    # RN50x4 is width=80, layers=(4,6,10,6), embed_dim=640; scale the width
    # by 1/4 (20 -> attnpool dim 640/4=160) to keep the CPU forward cheap
    # while preserving every shape relationship that distinguishes it.
    sd = oracle.make_rn50_state_dict(
        rng, width=20, layers=(4, 6, 10, 6), embed_dim=160,
    )
    cfg, params = convert_clip(sd, image_hw=(64, 32))
    assert cfg.resnet is not None
    assert cfg.resnet.width == 20
    assert cfg.resnet.layers == (4, 6, 10, 6)
    assert cfg.resnet.output_dim == 160
    assert cfg.resnet.heads == 20 * 32 // 64
    assert cfg.embed_dim == 160

    from tpu_reid.models import resnet as R

    images = rng.randn(2, 64, 32, 3).astype(np.float32)
    x3, x4, xproj = R.apply_resnet(params["visual"], cfg.resnet,
                                   jnp.asarray(images))
    assert x4.shape == (2, 4, 2, 20 * 8 * 4)
    assert xproj.shape == (2, 9, 160)
    assert np.isfinite(np.asarray(xproj)).all()


@pytest.mark.slow
def test_rn101_shaped_conversion_and_forward():
    """RN101-shaped checkpoint: (3, 4, 23, 3) stage depths — exercises the
    two-digit block index in infer_config's layer-count regex and the deep
    layer3 chain (reference ships RN101, clip_custom.py:26-34)."""
    rng = np.random.RandomState(8)
    sd = oracle.make_rn50_state_dict(
        rng, width=16, layers=(3, 4, 23, 3), embed_dim=128,
    )
    cfg, params = convert_clip(sd, image_hw=(64, 32))
    assert cfg.resnet is not None
    assert cfg.resnet.layers == (3, 4, 23, 3)
    assert len(params["visual"]["layer3"]) == 23
    np.testing.assert_array_equal(
        params["visual"]["layer3"][15]["bn2"]["mean"],
        sd["visual.layer3.15.bn2.running_mean"],
    )

    from tpu_reid.models import resnet as R

    images = rng.randn(2, 64, 32, 3).astype(np.float32)
    _, x4, xproj = R.apply_resnet(params["visual"], cfg.resnet,
                                  jnp.asarray(images))
    assert x4.shape == (2, 4, 2, 16 * 8 * 4)
    assert xproj.shape == (2, 9, 128)
    assert np.isfinite(np.asarray(xproj)).all()


def test_vit_b32_shaped_inference():
    """ViT-B/32-shaped: patch 32 at native stride (no overlap) — the
    remaining vision geometry in the reference's checkpoint table."""
    rng = np.random.RandomState(9)
    sd = oracle.make_clip_state_dict(rng, patch=16, grid=4)
    cfg, params = convert_clip(sd, image_hw=(64, 48))
    assert cfg.vision is not None
    assert cfg.vision.patch_size == 16
    assert cfg.vision.stride == 16
    assert (cfg.vision.h_grid, cfg.vision.w_grid) == (4, 3)
    # pos embed resized from the 4x4 checkpoint grid to 4x3
    assert params["visual"]["positional_embedding"].shape == (13, 64)


def test_rn50_bn_stats_loaded():
    rng = np.random.RandomState(4)
    sd = oracle.make_rn50_state_dict(rng)
    cfg, params = convert_clip(sd, image_hw=(64, 32))
    np.testing.assert_array_equal(
        params["visual"]["bn1"]["mean"], sd["visual.bn1.running_mean"]
    )
    np.testing.assert_array_equal(
        params["visual"]["layer2"][0]["down_bn"]["var"],
        sd["visual.layer2.0.downsample.2.running_var"],
    )


def test_metaclip_hf_bin_roundtrip(tmp_path):
    """Format 4: a MetaCLIP HF `.bin` is a plain torch-pickled dict of
    tensors in OpenAI CLIP key layout (the reference feeds torch.load(...)
    straight into build_model_from_openai_state_dict,
    prompt_learning.py:695 / metaclip.py:545-570). Both the flat layout and
    a {"state_dict": ...} nesting must load and convert identically."""
    import torch

    from tpu_reid.weights.convert import convert_clip, load_state_dict

    sd_t = {k: torch.from_numpy(v) for k, v in SD.items()}

    flat = tmp_path / "metaclip_b16.bin"
    torch.save(sd_t, str(flat))
    nested = tmp_path / "metaclip_b16_nested.bin"
    torch.save({"state_dict": sd_t}, str(nested))

    import jax

    for path in (flat, nested):
        sd = load_state_dict(str(path))
        assert set(sd.keys()) == set(SD.keys())
        cfg, params = convert_clip(sd, image_hw=(32, 16), stride=8)
        cfg0, params0 = convert_clip(SD, image_hw=(32, 16), stride=8)
        assert cfg == cfg0
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_vit_b16_full_geometry_parity():
    """Full flagship geometry: real ViT-B/16 dimensions (768x12, heads 12)
    at 256x128 stride 12 (S=211), converted from a random OpenAI-format
    checkpoint with the 14x14 pos-embed bicubic-resized to 21x10 — fp32
    forward parity vs the torch oracle at all three feature levels
    (VERDICT r1 #3a; protocol: reference coop.py:441-490, maple.py:754-785).
    """
    from tpu_reid.tools.synth_market import make_vit_b16_state_dict

    sd = make_vit_b16_state_dict(np.random.RandomState(42), vocab=520)
    cfg, params = convert_clip(sd, image_hw=(256, 128), stride=12)
    assert (cfg.vision.h_grid, cfg.vision.w_grid) == (21, 10)
    assert cfg.vision.width == 768 and cfg.vision.layers == 12

    rng = np.random.RandomState(43)
    images = rng.randn(2, 256, 128, 3).astype(np.float32)
    x11, x12, xproj = V.apply_vit(
        params["visual"], cfg.vision, jnp.asarray(images)
    )
    sd2 = dict(sd)
    sd2["visual.positional_embedding"] = resize_pos_embed(
        sd["visual.positional_embedding"], 21, 10
    )
    o11, o12, oproj = oracle.vit_forward(
        sd2, images.transpose(0, 3, 1, 2), stride=12, n_layers=12, n_heads=12
    )
    # fp32 over 12 real-width layers: allow ~1e-3 absolute on O(1) features
    np.testing.assert_allclose(np.asarray(x11), o11, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(x12), o12, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(xproj), oproj, atol=2e-3, rtol=1e-3)

    # CLS-only fast path agrees at full geometry too
    _, c12, cproj = V.apply_vit(
        params["visual"], cfg.vision, jnp.asarray(images), cls_only=True
    )
    np.testing.assert_allclose(np.asarray(c12[:, 0]), o12[:, 0],
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cproj[:, 0]), oproj[:, 0],
                               atol=2e-3, rtol=1e-3)
