"""Numerical parity of the functional towers against torch reference ops.

torch here is a test oracle only (CPU); the product compute path is pure
JAX/XLA. These tests pin down the weight layout contract the torch->JAX
converter relies on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tpu_reid.configs import PromptDesign, VisionConfig, TextConfig
from tpu_reid.models import layers as L
from tpu_reid.models import vit as V
from tpu_reid.models import text as T
from tpu_reid.models.clip_model import resize_pos_embed


def test_multi_head_attention_matches_torch():
    rng = np.random.default_rng(0)
    b, s, d, h = 2, 10, 64, 4
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    p = {
        "in_proj": {
            "w": jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.normal(size=(3 * d,)).astype(np.float32) * 0.1),
        },
        "out_proj": {
            "w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        },
    }
    got = np.asarray(L.multi_head_attention(p, jnp.asarray(x), h))

    xt = torch.tensor(x).transpose(0, 1)  # (S, B, D)
    want, _ = torch.nn.functional.multi_head_attention_forward(
        xt, xt, xt, d, h,
        in_proj_weight=torch.tensor(np.asarray(p["in_proj"]["w"]).T.copy()),
        in_proj_bias=torch.tensor(np.asarray(p["in_proj"]["b"])),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=torch.tensor(np.asarray(p["out_proj"]["w"]).T.copy()),
        out_proj_bias=torch.tensor(np.asarray(p["out_proj"]["b"])),
        need_weights=False,
    )
    want = want.transpose(0, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_causal_masked_attention_matches_torch():
    rng = np.random.default_rng(1)
    b, s, d, h = 3, 7, 32, 2
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    p = {
        "in_proj": {
            "w": jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.2),
            "b": jnp.zeros((3 * d,), jnp.float32),
        },
        "out_proj": {
            "w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.2),
            "b": jnp.zeros((d,), jnp.float32),
        },
    }
    mask = L.causal_mask(s)
    got = np.asarray(L.multi_head_attention(p, jnp.asarray(x), h, mask=mask))

    tm = torch.full((s, s), float("-inf")).triu_(1)
    xt = torch.tensor(x).transpose(0, 1)
    want, _ = torch.nn.functional.multi_head_attention_forward(
        xt, xt, xt, d, h,
        in_proj_weight=torch.tensor(np.asarray(p["in_proj"]["w"]).T.copy()),
        in_proj_bias=torch.tensor(np.asarray(p["in_proj"]["b"])),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=torch.tensor(np.asarray(p["out_proj"]["w"]).T.copy()),
        out_proj_bias=torch.tensor(np.asarray(p["out_proj"]["b"])),
        need_weights=False, attn_mask=tm,
    )
    want = want.transpose(0, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_residual_block_matches_torch_composition():
    rng = np.random.default_rng(2)
    d, h, s, b = 48, 4, 6, 2
    key = jax.random.PRNGKey(0)
    p = L.init_block(key, d, 12)
    # randomize LN affine so the test is not trivial
    p["ln_1"]["scale"] = jnp.asarray(rng.normal(1, 0.1, d).astype(np.float32))
    p["ln_2"]["bias"] = jnp.asarray(rng.normal(0, 0.1, d).astype(np.float32))
    x = rng.normal(size=(b, s, d)).astype(np.float32)
    got = np.asarray(L.residual_block(p, jnp.asarray(x), h))

    def tln(pp, t):
        return torch.nn.functional.layer_norm(
            t, (d,), torch.tensor(np.asarray(pp["scale"])),
            torch.tensor(np.asarray(pp["bias"])),
        )

    xt = torch.tensor(x)
    a_in = tln(p["ln_1"], xt).transpose(0, 1)
    attn, _ = torch.nn.functional.multi_head_attention_forward(
        a_in, a_in, a_in, d, h,
        in_proj_weight=torch.tensor(np.asarray(p["attn"]["in_proj"]["w"]).T.copy()),
        in_proj_bias=torch.tensor(np.asarray(p["attn"]["in_proj"]["b"])),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=torch.tensor(np.asarray(p["attn"]["out_proj"]["w"]).T.copy()),
        out_proj_bias=torch.tensor(np.asarray(p["attn"]["out_proj"]["b"])),
        need_weights=False,
    )
    xt = xt + attn.transpose(0, 1)
    hmid = tln(p["ln_2"], xt)
    hmid = hmid @ torch.tensor(np.asarray(p["mlp"]["c_fc"]["w"])) + torch.tensor(
        np.asarray(p["mlp"]["c_fc"]["b"])
    )
    hmid = hmid * torch.sigmoid(1.702 * hmid)
    hmid = hmid @ torch.tensor(np.asarray(p["mlp"]["c_proj"]["w"])) + torch.tensor(
        np.asarray(p["mlp"]["c_proj"]["b"])
    )
    want = (xt + hmid).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_vit_triple_output_shapes_and_stride():
    design = PromptDesign(trainer="IVLP", vision_depth=12, vision_ctx=2,
                          language_depth=12, language_ctx=2)
    hg, wg = VisionConfig.grid_for((64, 32), 16, 12)
    assert (hg, wg) == (5, 2)
    cfg = VisionConfig(layers=4, width=64, patch_size=16, stride=12,
                       h_grid=hg, w_grid=wg, output_dim=32, design=design)
    params = V.init_vit(jax.random.PRNGKey(1), cfg)
    assert "vpt_shallow" in params and "vpt_deep" in params
    imgs = jnp.asarray(np.random.default_rng(3).normal(size=(2, 64, 32, 3)),
                       jnp.float32)
    x11, x12, xproj = V.apply_vit(params, cfg, imgs)
    s = hg * wg + 1 + 2
    assert x11.shape == (2, s, 64)
    assert x12.shape == (2, s, 64)
    assert xproj.shape == (2, s, 32)


@pytest.mark.slow
def test_deep_prompts_change_output_only_when_enabled():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(1, 64, 32, 3)), jnp.float32)
    base = PromptDesign()
    cfg0 = VisionConfig(layers=3, width=32, patch_size=16, stride=16,
                        h_grid=4, w_grid=2, output_dim=16, design=base)
    p0 = V.init_vit(jax.random.PRNGKey(2), cfg0)
    a = V.apply_vit(p0, cfg0, imgs)[2]
    b = V.apply_vit(p0, cfg0, imgs)[2]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ivlp = PromptDesign(trainer="IVLP", vision_depth=3, vision_ctx=2)
    cfg1 = VisionConfig(layers=3, width=32, patch_size=16, stride=16,
                        h_grid=4, w_grid=2, output_dim=16, design=ivlp)
    p1 = V.init_vit(jax.random.PRNGKey(2), cfg1)
    out1 = V.apply_vit(p1, cfg1, imgs)[2]
    # NB: + constant would be invisible through LayerNorm; perturb randomly
    noise = jax.random.normal(jax.random.PRNGKey(99), p1["vpt_deep"].shape)
    p1b = dict(p1, vpt_deep=p1["vpt_deep"] + noise)
    out2 = V.apply_vit(p1b, cfg1, imgs)[2]
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_text_splice_keeps_sos_and_suffix():
    x = jnp.arange(2 * 6 * 3, dtype=jnp.float32).reshape(2, 6, 3)
    prompt = jnp.full((2, 3), -1.0)
    y = L.splice_prompt_tokens(x, prompt, text_side=True)
    np.testing.assert_array_equal(np.asarray(y[:, 0]), np.asarray(x[:, 0]))
    np.testing.assert_array_equal(np.asarray(y[:, 1:3]), -np.ones((2, 2, 3)))
    np.testing.assert_array_equal(np.asarray(y[:, 3:]), np.asarray(x[:, 3:]))


def test_vision_splice_replaces_tail():
    x = jnp.arange(1 * 5 * 2, dtype=jnp.float32).reshape(1, 5, 2)
    prompt = jnp.full((2, 2), 9.0)
    y = L.splice_prompt_tokens(x, prompt, text_side=False)
    np.testing.assert_array_equal(np.asarray(y[:, :3]), np.asarray(x[:, :3]))
    np.testing.assert_array_equal(np.asarray(y[:, 3:]), 9 * np.ones((1, 2, 2)))


@pytest.mark.slow
def test_eot_pooling_is_causal():
    cfg = TextConfig(layers=2, width=32, heads=2, vocab_size=100,
                     context_length=12, output_dim=16)
    params = T.init_text(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(6)
    toks = rng.integers(1, 90, size=(2, 12))
    toks[:, 0] = 0
    toks[:, 5] = 99  # EOT = highest id at position 5
    toks[:, 6:] = 1
    out1 = T.encode_text_tokens(params, cfg, jnp.asarray(toks))
    toks2 = toks.copy()
    toks2[:, 7:] = 42  # change tokens after EOT (ids stay below 99)
    out2 = T.encode_text_tokens(params, cfg, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    assert out1.shape == (2, 16)


def test_resize_pos_embed_matches_torch_bicubic():
    rng = np.random.default_rng(7)
    posemb = rng.normal(size=(1 + 14 * 14, 24)).astype(np.float32)
    got = resize_pos_embed(posemb, 21, 11)
    grid = torch.tensor(posemb[1:].reshape(1, 14, 14, 24)).permute(0, 3, 1, 2)
    want_grid = torch.nn.functional.interpolate(
        grid, size=(21, 11), mode="bicubic"
    ).permute(0, 2, 3, 1).reshape(21 * 11, 24).numpy()
    np.testing.assert_array_equal(got[0], posemb[0])
    np.testing.assert_allclose(got[1:], want_grid, atol=1e-5)


@pytest.mark.slow
def test_jpm_shapes_and_shuffle():
    f = jnp.arange(1 * 6 * 2, dtype=jnp.float32).reshape(1, 6, 2)
    y = V.shuffle_unit(f, shift=2, group=1)
    np.testing.assert_array_equal(
        np.asarray(y[0, :, 0]), np.asarray(jnp.roll(f[0, :, 0], -2))
    )
    cfg = VisionConfig(layers=2, width=32, patch_size=16, stride=16,
                       h_grid=4, w_grid=2, output_dim=16)
    params = V.init_vit(jax.random.PRNGKey(8), cfg)
    jpm = V.init_jpm(params, cfg)
    x12 = jnp.asarray(np.random.default_rng(9).normal(size=(2, 9, 32)),
                      jnp.float32)
    out = V.apply_jpm(jpm, cfg, x12)
    assert out.shape == (2, 9, 32)


@pytest.mark.slow
def test_residual_block_cls_matches_full_block():
    """CLS-only last block == full block restricted to position 0 (exact)."""
    d, h, s, b = 48, 4, 13, 3
    p = L.init_block(jax.random.PRNGKey(11), d, 2)
    x = jnp.asarray(np.random.default_rng(12).normal(size=(b, s, d)) * 0.3,
                    jnp.float32)
    full = L.residual_block(p, x, h)
    cls = L.residual_block_cls(p, x, h)
    assert cls.shape == (b, 1, d)
    np.testing.assert_allclose(
        np.asarray(cls[:, 0]), np.asarray(full[:, 0]), atol=1e-5
    )


@pytest.mark.slow
def test_apply_vit_cls_only_matches_full():
    """cls_only path (incl. deep-prompt splice before the last block) agrees
    with the full forward at position 0 for all three feature levels."""
    design = PromptDesign(trainer="IVLP", vision_depth=3, vision_ctx=2,
                          language_depth=1, language_ctx=2)
    hg, wg = VisionConfig.grid_for((64, 32), 16, 12)
    cfg = VisionConfig(layers=4, width=64, patch_size=16, stride=12,
                       h_grid=hg, w_grid=wg, output_dim=32, design=design)
    params = V.init_vit(jax.random.PRNGKey(21), cfg)
    imgs = jnp.asarray(np.random.default_rng(22).normal(size=(2, 64, 32, 3)),
                       jnp.float32)
    x11_f, x12_f, xp_f = V.apply_vit(params, cfg, imgs)
    x11_c, x12_c, xp_c = V.apply_vit(params, cfg, imgs, cls_only=True)
    assert x12_c.shape == (2, 1, 64) and xp_c.shape == (2, 1, 32)
    np.testing.assert_allclose(np.asarray(x11_c[:, 0]), np.asarray(x11_f[:, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x12_c[:, 0]), np.asarray(x12_f[:, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xp_c[:, 0]), np.asarray(xp_f[:, 0]),
                               atol=1e-5)


@pytest.mark.slow
def test_residual_block_cls_gradients_match():
    """For a CLS-only loss, gradients through the cls block equal gradients
    through the full block — the trainers can use the fast path."""
    d, h, s, b = 32, 4, 9, 2
    p = L.init_block(jax.random.PRNGKey(31), d, 2)
    x = jnp.asarray(np.random.default_rng(32).normal(size=(b, s, d)) * 0.3,
                    jnp.float32)

    g_full = jax.grad(lambda q: jnp.sum(L.residual_block(q, x, h)[:, 0] ** 2))(p)
    g_cls = jax.grad(lambda q: jnp.sum(L.residual_block_cls(q, x, h)[:, 0] ** 2))(p)
    for a, b_ in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_cls)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_patch_embed_conv_matches_gemm_decomposition():
    """The production strided-conv lowering and the stride-boundary gemm
    decomposition are the same math (incl. the optional folded bias)."""
    hg, wg = VisionConfig.grid_for((64, 32), 16, 12)
    cfg = VisionConfig(layers=1, width=64, patch_size=16, stride=12,
                       h_grid=hg, w_grid=wg, output_dim=32)
    rng = np.random.default_rng(40)
    p = {"conv": {
        "w": jnp.asarray(rng.normal(size=(16, 16, 3, 64)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32),
    }}
    imgs = jnp.asarray(rng.normal(size=(3, 64, 32, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(V._patch_embed_conv(p, cfg, imgs)),
        np.asarray(V._patch_embed_gemm(p, cfg, imgs)),
        atol=1e-4,
    )


@pytest.mark.slow
def test_fold_input_norm_matches_normalized_path():
    """folded=True extraction on raw uint8 equals the normalize-then-embed
    path (models.reid_clip.fold_input_norm): affine normalization folded
    into the patch-embed weights is exact math."""
    from tests.test_trainer import tiny_model
    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models import reid_clip as M
    from tpu_reid.parallel.extract import make_extractor

    mcfg, params = tiny_model("coop")
    pp = DevicePreprocess((32, 16), "vit", dtype=jnp.float32)
    rng = np.random.default_rng(41)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 32, 16, 3)), jnp.uint8)

    embed = lambda p, im: M.eval_embed(p, mcfg, im)
    plain = make_extractor(embed, pp, flip_tta=True, dtype=jnp.float32)
    folded = make_extractor(embed, pp, flip_tta=True, dtype=jnp.float32,
                            fold=lambda p: M.fold_input_norm(p, mcfg, "vit"))
    f_plain = np.asarray(plain(params, imgs))
    f_fold = np.asarray(folded(params, imgs))
    np.testing.assert_allclose(f_fold, f_plain, atol=2e-4)

    # resize path: bicubic resize commutes with the folded affine
    big = jnp.asarray(rng.integers(0, 256, (4, 48, 20, 3)), jnp.uint8)
    np.testing.assert_allclose(
        np.asarray(folded(params, big)),
        np.asarray(plain(params, big)),
        atol=2e-4,
    )
