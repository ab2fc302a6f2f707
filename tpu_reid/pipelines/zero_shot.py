"""Zero-shot ReID pipeline: frozen CLIP + attribute-prompt classifier.

Mirrors the reference's zero_shot_learning.py behavior as jitted programs:
  * zeroshot_classifier — per-identity text weights: encode each template,
    L2-normalize, mean over templates, L2-normalize again
    (reference: zero_shot_learning.py:37-55),
  * dual-pass flip-TTA inference — plain + forced-hflip features averaged
    (reference: zero_shot_learning.py:61-128); ViT features are
    cat(x12 CLS, xproj CLS); ModifiedResNet avg-pools the final map and
    takes the attention-pooled token (reference: :85-90),
  * --mm multimodal mode — the retrieval embedding becomes
    cat(image_features, softmax(1/0.07 * norm(proj) @ zs_weights.T))
    (reference: :117-122),
  * evaluation through the on-device Evaluator (CMC Rank-1/5/10 + mAP,
    max_rank 50 — reference: zero_shot_learning.py:147).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_reid.configs import CLIPConfig
from tpu_reid.models import resnet as R
from tpu_reid.models import text as T
from tpu_reid.models import vit as V
from tpu_reid.models.tokenizer import ClipTokenizer
from tpu_reid.retrieval import Evaluator, l2_normalize


def zeroshot_classifier(
    clip_params: dict,
    cfg: CLIPConfig,
    tokenizer: ClipTokenizer,
    classnames: Sequence[str],
    templates: Dict[str, object],
    augmented: bool,
    batch: int = 64,
) -> jax.Array:
    """(n_cls, E) normalized per-identity text classifier weights."""
    _encode = jax.jit(
        lambda p, tok: T.encode_text_tokens(p, cfg.text, tok)
    )
    text_params = jax.tree.map(jnp.asarray, clip_params["text"])

    def encode(tok):
        return _encode(text_params, tok)

    ctx_len = cfg.text.context_length
    if not augmented:
        texts = [templates[c] for c in classnames]
        tokens = tokenizer.tokenize(texts, context_length=ctx_len,
                                    truncate=True)
        feats = []
        pad = (-len(texts)) % batch
        tokens = np.concatenate(
            [tokens, np.zeros((pad, tokens.shape[1]), np.int32)]
        )
        for i in range(0, tokens.shape[0], batch):
            feats.append(encode(jnp.asarray(tokens[i : i + batch])))
        out = jnp.concatenate(feats)[: len(texts)]
        return l2_normalize(out, axis=-1)

    # augmented: T templates per class -> norm -> mean -> norm. All classes
    # share the template count, so this is one (n_cls*T,) batch sweep +
    # a reshaped mean — not the reference's 751 separate forward calls
    # (zero_shot_learning.py:40-49), same math.
    per_class = [templates[c] for c in classnames]
    n_t = len(per_class[0])
    assert all(len(p) == n_t for p in per_class), "ragged template counts"
    flat = [t for ts in per_class for t in ts]
    tokens = tokenizer.tokenize(flat, context_length=ctx_len, truncate=True)
    pad = (-len(flat)) % batch
    tokens = np.concatenate(
        [tokens, np.zeros((pad, tokens.shape[1]), np.int32)]
    )
    feats = []
    for i in range(0, tokens.shape[0], batch):
        feats.append(encode(jnp.asarray(tokens[i : i + batch])))
    feats = jnp.concatenate(feats)[: len(flat)]
    feats = l2_normalize(feats, axis=-1)
    feats = feats.reshape(len(classnames), n_t, -1).mean(axis=1)
    return l2_normalize(feats, axis=-1)


def make_zeroshot_embed(clip_params: dict, cfg: CLIPConfig):
    """(params, images) -> cat(non_proj_feature, proj_feature).

    ViT: CLS rows of (x12, xproj); RN: spatial avg-pool of the final map +
    attention-pooled token (reference: zero_shot_learning.py:85-90)."""

    if cfg.vision is not None:

        def embed(params, images):
            _, x12, xproj = V.apply_vit(
                params["visual"], cfg.vision, images, cls_only=True
            )
            return jnp.concatenate([x12[:, 0], xproj[:, 0]], axis=-1)

    else:

        def embed(params, images):
            _, x4, xproj = R.apply_resnet(params["visual"], cfg.resnet, images)
            pooled = jnp.mean(x4, axis=(1, 2))
            return jnp.concatenate([pooled, xproj[:, 0]], axis=-1)

    return embed


def mm_embeddings(
    features: jax.Array, proj_dim: int, zs_weights: jax.Array
) -> jax.Array:
    """--mm mode: replace the projected half with softmaxed zero-shot logits
    (reference: zero_shot_learning.py:117-122)."""
    non_proj = features[:, :-proj_dim]
    proj = l2_normalize(features[:, -proj_dim:], axis=-1)
    logits = jax.nn.softmax(
        (1.0 / 0.07) * proj @ zs_weights.T.astype(proj.dtype), axis=-1
    )
    return jnp.concatenate([non_proj, logits], axis=-1)


def evaluate_zero_shot(
    query_feats: jax.Array,
    gallery_feats: jax.Array,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    zs_weights: Optional[jax.Array] = None,
    proj_dim: int = 512,
    multimodal: bool = False,
    max_rank: int = 50,
    reranking: bool = False,
    mesh=None,
    with_minp: bool = False,
):
    """Final ranking: optional mm transform, then CMC/mAP on device.
    Returns (cmc, mAP), or (cmc, mAP, mINP) when with_minp."""
    if multimodal:
        assert zs_weights is not None
        query_feats = mm_embeddings(query_feats, proj_dim, zs_weights)
        gallery_feats = mm_embeddings(gallery_feats, proj_dim, zs_weights)
    ev = Evaluator(
        num_query=int(query_feats.shape[0]),
        max_rank=max_rank,
        feat_norm=True,
        reranking=reranking,
        mesh=mesh,
        with_minp=with_minp,
    )
    ev.update(query_feats, q_pids, q_camids)
    ev.update(gallery_feats, g_pids, g_camids)
    return ev.compute()
