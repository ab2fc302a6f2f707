"""CLIP causal text transformer — functional, TPU-first.

Two entry points mirroring the reference surfaces:
  * `encode_text_tokens`: tokens -> embeddings -> transformer -> EOT pooling
    (reference: coop.py:384-395),
  * `encode_text_embeddings`: pre-built prompt embeddings (from a prompt
    learner) -> transformer -> EOT pooling (reference: text_encoder.py:14-24),
    with optional per-layer deep language prompts (reference:
    maple.py:630-640 splice rule: keep SOS, replace tokens 1..n_ctx).

EOT pooling uses the argmax of the token ids — the EOT token has the highest
id in CLIP's vocab (reference: text_encoder.py:23).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu_reid.configs import TextConfig
from tpu_reid.models import layers as L


def init_text(key: jax.Array, cfg: TextConfig) -> dict:
    ks = jax.random.split(key, 4)
    params = {
        "token_embedding": 0.02 * jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.width)
        ),
        "positional_embedding": 0.01 * jax.random.normal(
            ks[1], (cfg.context_length, cfg.width)
        ),
        "blocks": L.init_stack(ks[2], cfg.layers, cfg.width),
        "ln_final": L.init_layer_norm(cfg.width),
        "text_projection": (cfg.width ** -0.5) * jax.random.normal(
            ks[3], (cfg.width, cfg.output_dim)
        ),
    }
    d = cfg.design
    if d.has_language_prompts and d.language_depth > 1 and d.trainer in ("IVLP", "VPT"):
        params["vpt_deep"] = 0.02 * jax.random.normal(
            jax.random.fold_in(ks[2], 7),
            (cfg.layers, d.language_ctx, cfg.width),
        )
    return params


def _deep_prompt_flags(cfg: TextConfig) -> jax.Array:
    i = jnp.arange(cfg.layers)
    return (i > 0) & (i < cfg.design.language_depth)


def _transform(
    params: dict,
    cfg: TextConfig,
    x: jax.Array,
    deep_prompts: Optional[jax.Array],
) -> jax.Array:
    mask = L.causal_mask(x.shape[1])
    dp = deep_prompts if deep_prompts is not None else params.get("vpt_deep")
    flags = _deep_prompt_flags(cfg) if dp is not None else None
    x = L.transformer_stack(
        params["blocks"], x, cfg.heads, mask=mask,
        deep_prompts=dp, prompt_flags=flags, text_side=True,
    )
    return L.layer_norm(params["ln_final"], x)


def pool_eot(
    x: jax.Array, eot_idx: jax.Array, text_projection: jax.Array
) -> jax.Array:
    """Take each sequence's EOT feature and project: (B, S, D) -> (B, E)."""
    b = x.shape[0]
    feats = x[jnp.arange(b), eot_idx]
    return jnp.dot(feats, text_projection.astype(x.dtype))


def encode_text_embeddings(
    params: dict,
    cfg: TextConfig,
    prompt_embeddings: jax.Array,
    eot_idx: jax.Array,
    deep_prompts: Optional[jax.Array] = None,
) -> jax.Array:
    """Prompt-learner path: embeddings already include learned context.

    prompt_embeddings: (B, context_length, width) WITHOUT positional
    embedding (it is added here, reference: text_encoder.py:15).
    eot_idx: (B,) argmax of the tokenized prompts.
    """
    x = prompt_embeddings + params["positional_embedding"].astype(
        prompt_embeddings.dtype
    )
    x = _transform(params, cfg, x, deep_prompts)
    return pool_eot(x, eot_idx, params["text_projection"])


def encode_text_embeddings_augmented(
    params: dict,
    cfg: TextConfig,
    prompt_embeddings: jax.Array,
    eot_idx: jax.Array,
    deep_prompts: Optional[jax.Array] = None,
) -> jax.Array:
    """Augmented-template path: (B, T, L, D) prompt embeddings (one row per
    article-variant template) -> per-template encode -> mean over the
    template axis (reference: text_encoder.py:27-53 TextEncoderAugmented).

    eot_idx: (B, T). Vectorized over T instead of the reference's Python
    loop — one batched program."""
    b, t, l, d = prompt_embeddings.shape
    flat = prompt_embeddings.reshape(b * t, l, d)
    flat_eot = eot_idx.reshape(b * t)
    feats = encode_text_embeddings(params, cfg, flat, flat_eot, deep_prompts)
    return feats.reshape(b, t, -1).mean(axis=1)


def encode_text_tokens(
    params: dict,
    cfg: TextConfig,
    tokens: jax.Array,
    deep_prompts: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain CLIP text encoding from token ids (B, context_length)."""
    x = params["token_embedding"][tokens]
    eot_idx = jnp.argmax(tokens, axis=-1)
    x = x + params["positional_embedding"].astype(x.dtype)
    x = _transform(params, cfg, x, deep_prompts)
    return pool_eot(x, eot_idx, params["text_projection"])
