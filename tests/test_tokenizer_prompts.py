"""BPE tokenizer + prompt-learner splice geometry tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_reid.models.tokenizer import ClipTokenizer, bytes_to_unicode, write_test_merges
from tpu_reid.models import prompts as P


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bpe") / "merges.txt.gz")
    # Merges over a tiny alphabet: build "photo", "of", "a</w>" style tokens.
    merges = [
        ("p", "h"), ("ph", "o"), ("pho", "t"), ("phot", "o</w>"),
        ("o", "f</w>"), ("a", "b"),
    ]
    write_test_merges(path, merges)
    return ClipTokenizer(path, n_merges=len(merges))


def test_byte_table_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_vocab_layout(tok):
    # 256 bytes + 256 byte</w> + merges + 2 specials; EOT is the max id.
    assert tok.eot == tok.vocab_size - 1
    assert tok.sot == tok.vocab_size - 2
    assert tok.encoder["<|endoftext|>"] == tok.eot


def test_bpe_merging(tok):
    # "photo" should fully merge through the rule chain p+h, ph+o, pho+t, phot+o</w>
    assert tok.bpe("photo") == "photo</w>"
    assert tok.encoder["photo</w>"] >= 512
    # "of" -> o+f then needs f</w>... rule ("o","f") gives "of" + ...
    pieces = tok.bpe("of").split(" ")
    assert "".join(pieces).replace("</w>", "") == "of"


def test_tokenize_layout(tok):
    arr = tok.tokenize("A photo of x", context_length=10)
    assert arr.shape == (1, 10)
    assert arr[0, 0] == tok.sot
    eot_pos = int(np.argmax(arr[0]))
    assert arr[0, eot_pos] == tok.eot
    assert (arr[0, eot_pos + 1:] == 0).all()
    # lowercasing: "A" and "a" tokenize identically
    np.testing.assert_array_equal(
        tok.tokenize("PHOTO"), tok.tokenize("photo")
    )


def test_tokenize_truncation(tok):
    long = "photo " * 50
    with pytest.raises(RuntimeError):
        tok.tokenize(long, context_length=8)
    arr = tok.tokenize(long, context_length=8, truncate=True)
    assert arr[0, -1] == tok.eot


def test_decode_roundtrip(tok):
    ids = tok.encode("a photo of x photo")
    assert tok.decode(ids).strip() == "a photo of x photo"


# ---------------------------------------------------------------------------
# prompt learners
# ---------------------------------------------------------------------------


def _fake_template(n_templates=1, length=12, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    emb = rng.randn(n_templates, length, dim).astype(np.float32)
    tokens = np.zeros((n_templates, length), np.int32)
    tokens[:, 0] = 90
    tokens[:, 1:10] = rng.randint(1, 80, (n_templates, 9))
    tokens[:, 10] = 99  # EOT at position 10
    return emb, tokens


def test_coop_splice_geometry():
    cfg = P.PromptLearnerConfig.coop(n_cls=7)
    emb, tokens = _fake_template(length=12)
    params = P.init_prompt_learner(jax.random.key(0), cfg, emb, tokens)
    label = jnp.array([3, 0])
    prompts, eot = P.apply_prompt_learner(params, cfg, label)
    assert prompts.shape == (2, 12, 8)
    assert int(eot[0]) == 10
    # frozen prefix: tokens 0..3 match the template embedding
    np.testing.assert_allclose(np.asarray(prompts[0, :4]), emb[0, :4])
    # learnable ctx: tokens 4..8 equal cls_ctx[label]
    np.testing.assert_allclose(
        np.asarray(prompts[0, 4:9]), np.asarray(params["cls_ctx"][3])
    )
    # frozen suffix: tokens 9.. match template tail
    np.testing.assert_allclose(np.asarray(prompts[0, 9:]), emb[0, 9:])


def test_ivlp_splice_geometry():
    cfg = P.PromptLearnerConfig.ivlp(n_cls=4)
    emb, tokens = _fake_template(length=12)
    params = P.init_prompt_learner(jax.random.key(1), cfg, emb, tokens)
    prompts, eot = P.apply_prompt_learner(params, cfg, jnp.array([2]))
    np.testing.assert_allclose(np.asarray(prompts[0, :5]), emb[0, :5])
    np.testing.assert_allclose(
        np.asarray(prompts[0, 5:9]), np.asarray(params["cls_ctx"][2])
    )
    np.testing.assert_allclose(np.asarray(prompts[0, 9:]), emb[0, 9:])


@pytest.mark.slow
def test_augmented_template_axis():
    cfg = P.PromptLearnerConfig.augmented(n_cls=5)
    emb, tokens = _fake_template(n_templates=4, length=12)
    params = P.init_prompt_learner(jax.random.key(2), cfg, emb, tokens)
    prompts, eot = P.apply_prompt_learner(params, cfg, jnp.array([1, 4, 0]))
    assert prompts.shape == (3, 4, 12, 8)
    assert eot.shape == (3, 4)
    # same ctx across the template axis
    np.testing.assert_allclose(
        np.asarray(prompts[0, 0, 5:9]), np.asarray(prompts[0, 3, 5:9])
    )
    # per-template frozen prefix
    np.testing.assert_allclose(np.asarray(prompts[1, 2, :5]), emb[2, :5])


@pytest.mark.slow
def test_per_class_templates():
    n_cls = 6
    cfg = P.PromptLearnerConfig.veri(n_cls)
    emb, tokens = _fake_template(n_templates=n_cls, length=12, seed=3)
    tokens[2, 10] = 0
    tokens[2, 8] = 99  # class 2 has a shorter prompt -> EOT at 8
    params = P.init_prompt_learner(jax.random.key(3), cfg, emb, tokens)
    prompts, eot = P.apply_prompt_learner(params, cfg, jnp.array([2, 5]))
    assert int(eot[0]) == 8 and int(eot[1]) == 10
    np.testing.assert_allclose(np.asarray(prompts[0, :4]), emb[2, :4])
    np.testing.assert_allclose(np.asarray(prompts[1, :4]), emb[5, :4])


@pytest.mark.slow
def test_caption_eot_shift():
    n_cls = 3
    cfg = P.PromptLearnerConfig.captions(n_cls)
    emb, tokens = _fake_template(n_templates=n_cls, length=12, seed=4)
    params = P.init_prompt_learner(jax.random.key(4), cfg, emb, tokens)
    prompts, eot = P.apply_prompt_learner(params, cfg, jnp.array([1]))
    assert prompts.shape == (1, 12, 8)
    # ctx inserted at 5..8, suffix = original tokens 5..7 (len-4 kept)
    np.testing.assert_allclose(np.asarray(prompts[0, 9:]), emb[1, 5:8])
    assert int(eot[0]) == 11  # argmax 10 shifted by 4, clamped to L-1


@pytest.mark.slow
def test_all_class_prompts():
    cfg = P.PromptLearnerConfig.coop(n_cls=5)
    emb, tokens = _fake_template(length=12)
    params = P.init_prompt_learner(jax.random.key(5), cfg, emb, tokens)
    prompts, eot = P.all_class_prompts(params, cfg)
    assert prompts.shape == (5, 12, 8)


def test_veri_template_text():
    texts = P.veri_templates(["red sedan", "bus", ""])
    # color spliced between the X placeholders and the type word, matching
    # the reference's "A photo of X X X red sedan, ..." (coop.py:136-137)
    assert texts[0].startswith("A photo of X X X red sedan,")
    assert "bus" in texts[1]
    assert texts[2].endswith("background.")


def test_veri_ivlp_template_geometry():
    """IVLP VeRi: 4 X placeholders, prefix = SOT + 'a photo of' (4 tokens),
    ctx exactly covers the X's (reference: maple.py:193-231)."""
    texts = P.veri_templates(["red sedan"], n_cls_ctx=4)
    assert texts[0].startswith("A photo of X X X X red sedan,")
    cfg = P.PromptLearnerConfig.veri_ivlp(3)
    assert cfg.n_prefix == 4 and cfg.n_cls_ctx == 4 and cfg.per_class
    # each X is a single BPE token: words 4..7 of the template are the X's
    words = texts[0].split(" ")
    assert words[3:7] == ["X", "X", "X", "X"]


@pytest.mark.slow
def test_augmented_text_encoding_mean_pools():
    """(B, T, L, D) prompts -> per-template encode -> mean over templates
    (reference TextEncoderAugmented, text_encoder.py:27-53)."""
    import tests.torch_oracle as oracle
    from tpu_reid.models import text as T
    from tpu_reid.weights.convert import convert_clip

    rng = np.random.RandomState(0)
    sd = oracle.make_clip_state_dict(rng, vocab=100, context=12)
    cfg, params = convert_clip(sd, image_hw=(32, 32), stride=8)

    pcfg = P.PromptLearnerConfig.augmented(n_cls=5)
    emb, tokens = _fake_template(n_templates=4, length=12)
    pl = P.init_prompt_learner(jax.random.key(0), pcfg, emb[:, :, :128], tokens)
    # build (B, T, L, D) prompts with the text width
    rng2 = np.random.RandomState(1)
    prompts = jnp.asarray(rng2.randn(3, 4, 12, 128).astype(np.float32) * 0.1)
    eot = jnp.full((3, 4), 10, jnp.int32)
    out = T.encode_text_embeddings_augmented(
        params["text"], cfg.text, prompts, eot
    )
    assert out.shape == (3, 24)
    # equals the mean of per-template encodings
    per = jnp.stack([
        T.encode_text_embeddings(params["text"], cfg.text, prompts[:, t],
                                 eot[:, t])
        for t in range(4)
    ], axis=1).mean(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(per), atol=1e-5,
                               rtol=1e-4)
