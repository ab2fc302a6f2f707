"""Tensor parallelism over the mesh "model" axis (Megatron-style sharding).

SURVEY.md §2.6 declares a TP axis for the tower widths; this module makes
it real. The reference has no distributed execution at all (single GPU,
literal .cuda() — SURVEY §2.6), so the design here is TPU-first rather
than a port:

  * column-parallel QKV: each model-shard owns a contiguous block of
    attention HEADS (the natural TP unit — no cross-shard attention
    traffic exists because heads are independent),
  * row-parallel out-projection: each shard contracts its heads' outputs
    against its rows of W_out; ONE psum over "model" per attention block,
  * column-parallel MLP up-projection / row-parallel down-projection:
    each shard owns a hidden-dim slice; the QuickGELU applies to local
    activations; ONE psum per MLP,
  * LayerNorms, biases, positional/class embeddings are replicated; biases
    are added AFTER the psum so they are counted once.

Parameters are re-laid-out so the sharded axis is a leading explicit axis
(heads for attention, hidden for the MLP) — `tp_layout` converts a stacked
block tree, `tp_shardings` gives the matching NamedShardings. The forward
runs inside `shard_map` over a 2-D ("data", "model") mesh: the batch is
sharded over "data", every model-group sees the full local batch, and the
two psums per block ride the ICI ring.

Numerics match models/layers exactly (fp32 LN statistics and softmax),
asserted against the single-device tower in tests/test_tp.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from tpu_reid.parallel.mesh import shard_map_nocheck
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_reid.configs import VisionConfig
from tpu_reid.models import layers as L


# ---------------------------------------------------------------------------
# parameter layout
# ---------------------------------------------------------------------------


def tp_layout(blocks: dict, n_heads: int) -> dict:
    """Stacked block tree -> TP layout with explicit shardable axes.

    Input leaves (stacked over L layers, JAX (in, out) linear layout):
      attn.in_proj.w (L, d, 3d), .b (L, 3d)
      attn.out_proj.w (L, d, d), .b (L, d)
      mlp.c_fc.w (L, d, hid), .b (L, hid)
      mlp.c_proj.w (L, hid, d), .b (L, d)
      ln_1 / ln_2 scale, bias (L, d)

    Output:
      qkv_w (L, H, d, 3dh)   — heads leading (shard axis 1)
      qkv_b (L, H, 3dh)
      out_w (L, H, dh, d)
      out_b (L, d)           — replicated, added post-psum
      fc_w  (L, d, hid), fc_b (L, hid)   — shard the hid axis
      proj_w (L, hid, d)                  — shard the hid axis
      proj_b (L, d)
      ln_1 / ln_2            — replicated
    """
    w_in = blocks["attn"]["in_proj"]["w"]
    b_in = blocks["attn"]["in_proj"]["b"]
    n_l, d, _ = w_in.shape
    dh = d // n_heads
    # packed columns are [q | k | v], head-major within each section
    qkv_w = (
        w_in.reshape(n_l, d, 3, n_heads, dh)
        .transpose(0, 3, 1, 2, 4)
        .reshape(n_l, n_heads, d, 3 * dh)
    )
    qkv_b = (
        b_in.reshape(n_l, 3, n_heads, dh)
        .transpose(0, 2, 1, 3)
        .reshape(n_l, n_heads, 3 * dh)
    )
    out_w = blocks["attn"]["out_proj"]["w"].reshape(n_l, n_heads, dh, d)
    return {
        "qkv_w": qkv_w,
        "qkv_b": qkv_b,
        "out_w": out_w,
        "out_b": blocks["attn"]["out_proj"]["b"],
        "fc_w": blocks["mlp"]["c_fc"]["w"],
        "fc_b": blocks["mlp"]["c_fc"]["b"],
        "proj_w": blocks["mlp"]["c_proj"]["w"],
        "proj_b": blocks["mlp"]["c_proj"]["b"],
        "ln_1": blocks["ln_1"],
        "ln_2": blocks["ln_2"],
    }


def tp_block_specs() -> dict:
    """PartitionSpecs matching tp_layout (leading layer axis unsharded)."""
    return {
        "qkv_w": P(None, "model"),
        "qkv_b": P(None, "model"),
        "out_w": P(None, "model"),
        "out_b": P(),
        "fc_w": P(None, None, "model"),
        "fc_b": P(None, "model"),
        "proj_w": P(None, "model"),
        "proj_b": P(),
        "ln_1": {"scale": P(), "bias": P()},
        "ln_2": {"scale": P(), "bias": P()},
    }


def tp_visual_layout(visual: dict, n_heads: int) -> dict:
    """Full ViT param tree -> TP layout (blocks transformed, rest kept)."""
    out = dict(visual)
    out["blocks"] = tp_layout(visual["blocks"], n_heads)
    return out


def tp_visual_specs(visual: dict) -> dict:
    """PartitionSpec tree for tp_visual_layout output (non-block leaves
    replicated)."""
    specs = jax.tree.map(lambda _: P(), visual)
    specs = dict(specs)
    specs["blocks"] = tp_block_specs()
    return specs


def shard_tp_visual(mesh: Mesh, visual_tp: dict) -> dict:
    """device_put the TP-laid-out ViT params with their NamedShardings."""
    named = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tp_visual_specs(visual_tp),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree.map(jax.device_put, visual_tp, named)


# ---------------------------------------------------------------------------
# forward (runs inside shard_map; arrays are per-device locals)
# ---------------------------------------------------------------------------


def tp_residual_block(
    p: dict, x: jax.Array, axis: str = "model"
) -> jax.Array:
    """Pre-norm block with head-/hidden-sharded weights: two psums total."""
    b, s, d = x.shape
    h = L.layer_norm(p["ln_1"], x)
    qkv = jnp.einsum(
        "bsd,hdq->bhsq", h, p["qkv_w"].astype(x.dtype)
    ) + p["qkv_b"].astype(x.dtype)[None, :, None, :]
    dh = p["qkv_w"].shape[-1] // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, Hl, S, dh)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(dh))
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    partial = jnp.einsum("bhqd,hdm->bqm", out, p["out_w"].astype(x.dtype))
    attn = lax.psum(partial, axis) + p["out_b"].astype(x.dtype)
    x = x + attn

    h = L.layer_norm(p["ln_2"], x)
    hid = jnp.dot(h, p["fc_w"].astype(x.dtype)) + p["fc_b"].astype(x.dtype)
    part = jnp.dot(L.quick_gelu(hid), p["proj_w"].astype(x.dtype))
    return x + lax.psum(part, axis) + p["proj_b"].astype(x.dtype)


def tp_stack(
    stacked: dict, x: jax.Array, axis: str = "model"
) -> jax.Array:
    def body(h, layer):
        return tp_residual_block(layer, h, axis), None

    x, _ = lax.scan(body, x, stacked)
    return x


def apply_vit_tp(
    params_tp: dict,
    cfg: VisionConfig,
    images: jax.Array,
    axis: str = "model",
    cls_only: bool = False,
):
    """TP twin of models.vit.apply_vit for the frozen-encoder paths (no
    prompt splicing — deep-prompt modes keep the DP path). Returns the
    (x11, x12, xproj) triple; see models/vit.py for the contract
    (reference: coop.py:203-227)."""
    from tpu_reid.models.vit import patch_embed

    x = patch_embed(params_tp, cfg, images)
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params_tp["class_embedding"].astype(x.dtype), (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params_tp["positional_embedding"].astype(x.dtype)
    x = L.layer_norm(params_tp["ln_pre"], x)

    n_layers = cfg.layers
    head = jax.tree.map(lambda a: a[: n_layers - 1], params_tp["blocks"])
    tail = jax.tree.map(lambda a: a[n_layers - 1], params_tp["blocks"])
    x11 = tp_stack(head, x, axis)
    x_last = x11[:, :1] if cls_only else x11
    if cls_only:
        # CLS-only last block, TP over heads: K/V from the full sequence
        p = tail
        h = L.layer_norm(p["ln_1"], x11)
        qkv = jnp.einsum(
            "bsd,hdq->bhsq", h, p["qkv_w"].astype(x11.dtype)
        ) + p["qkv_b"].astype(x11.dtype)[None, :, None, :]
        dh = p["qkv_w"].shape[-1] // 3
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q[:, :, :1]
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / np.sqrt(dh))
        probs = jax.nn.softmax(scores, axis=-1).astype(x11.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        partial = jnp.einsum(
            "bhqd,hdm->bqm", out, p["out_w"].astype(x11.dtype)
        )
        x0 = x_last + lax.psum(partial, axis) + p["out_b"].astype(x11.dtype)
        h2 = L.layer_norm(p["ln_2"], x0)
        hid = jnp.dot(h2, p["fc_w"].astype(x0.dtype)) + p["fc_b"].astype(
            x0.dtype
        )
        part = jnp.dot(L.quick_gelu(hid), p["proj_w"].astype(x0.dtype))
        x12 = x0 + lax.psum(part, axis) + p["proj_b"].astype(x0.dtype)
    else:
        x12 = tp_residual_block(tail, x_last, axis)

    x12 = L.layer_norm(params_tp["ln_post"], x12)
    xproj = jnp.dot(x12, params_tp["proj"].astype(x12.dtype))
    return x11, x12, xproj


# ---------------------------------------------------------------------------
# 2-D extractor: batch over "data", width over "model"
# ---------------------------------------------------------------------------


def make_tp_extractor(
    mesh: Mesh,
    cfg: VisionConfig,
    preprocess=None,
    flip_tta: bool = True,
    dtype=jnp.bfloat16,
    cls_only: bool = True,
):
    """Jitted 2-D-parallel zero-shot embedding step.

    (params_tp_sharded, images_u8) -> cat(x12 CLS, xproj CLS) features.
    images are global (B, H, W, 3) uint8, batch sharded over "data" and
    replicated over "model"; params sharded per tp_visual_specs. Use
    shard_tp_visual to place the params."""

    def local(params, images_u8):
        x = (
            preprocess.eval_batch(images_u8) if preprocess is not None
            else images_u8
        ).astype(dtype)

        def embed(xx):
            _, x12, xproj = apply_vit_tp(
                params, cfg, xx, cls_only=cls_only
            )
            return jnp.concatenate([x12[:, 0], xproj[:, 0]], axis=-1)

        feats = embed(x)
        if flip_tta:
            feats = (feats + embed(x[:, :, ::-1])) * 0.5
        return feats.astype(jnp.float32)

    def step(params, images_u8):
        specs = tp_visual_specs(params)
        return shard_map_nocheck(
            local,
            mesh=mesh,
            in_specs=(specs, P("data")),
            out_specs=P("data"),
        )(params, images_u8)

    return jax.jit(step)
