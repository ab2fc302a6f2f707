"""MaPLe multi-modal prompt coupling.

MaPLe (reference: maple.py:647-719, 788-844) differs from IVLP in that the
vision prompts are not independent parameters: a shared text-side context
plus per-layer deeper text prompts are PROJECTED into the vision width by
per-layer linear couplings, so both towers are steered by one set of
learnable tokens.

This module owns those parameters and produces the per-layer prompt stacks
that the existing towers already accept:
  * models.vit.apply_vit(..., deep_prompts=...)   — (L, n_ctx, d_vis)
  * models.text.encode_text_embeddings(..., deep_prompts=...) — (L, n_ctx, d_text)
Layer 0's prompts are the shallow ones (appended to the vision input /
spliced into the text prompt); layers 1..depth-1 replace tokens in-flight
with the same gating as IVLP (`prompts_needed > i`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_maple(
    key: jax.Array,
    n_ctx: int,
    depth: int,
    d_text: int,
    d_vis: int,
) -> dict:
    """shared_ctx: the layer-0 text context; text_deep: per-layer deeper text
    prompts (layers 1..depth-1); proj: per-layer text->vision couplings
    (reference: one nn.Linear(d_text, d_vis) per prompted layer)."""
    ks = jax.random.split(key, 3)
    scale = d_text ** -0.5
    return {
        "shared_ctx": 0.02 * jax.random.normal(ks[0], (n_ctx, d_text)),
        "text_deep": 0.02 * jax.random.normal(
            ks[1], (max(depth - 1, 0), n_ctx, d_text)
        ),
        "proj": {
            "w": scale * jax.random.normal(ks[2], (depth, d_text, d_vis)),
            "b": jnp.zeros((depth, d_vis)),
        },
    }


def maple_prompt_stacks(
    params: dict, n_layers: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (vision_shallow (n_ctx, d_vis),
                vision_deep (n_layers, n_ctx, d_vis),
                text_deep (n_layers, n_ctx, d_text)).

    The deep stacks are zero-padded past the coupling depth; the towers'
    per-layer gating (i < depth) keeps padded layers inert."""
    shared = params["shared_ctx"]
    depth = params["proj"]["w"].shape[0]
    n_ctx, d_text = shared.shape

    text_all = jnp.concatenate(
        [shared[None], params["text_deep"]], axis=0
    )  # (depth, n_ctx, d_text)
    vis_all = (
        jnp.einsum("lcd,lde->lce", text_all, params["proj"]["w"])
        + params["proj"]["b"][:, None, :]
    )  # (depth, n_ctx, d_vis)

    d_vis = vis_all.shape[-1]
    pad_l = max(n_layers - depth, 0)
    # coupling depth may exceed a (small) tower's layer count; extra
    # couplings are inert either way because layer gating stops at n_layers
    vision_deep = jnp.concatenate(
        [vis_all[:n_layers], jnp.zeros((pad_l, n_ctx, d_vis), vis_all.dtype)],
        axis=0,
    )
    text_deep = jnp.concatenate(
        [text_all[:n_layers], jnp.zeros((pad_l, n_ctx, d_text), text_all.dtype)],
        axis=0,
    )
    return vis_all[0], vision_deep, text_deep
