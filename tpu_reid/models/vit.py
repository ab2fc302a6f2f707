"""CLIP ReID vision transformer — functional, TPU-first.

Capabilities mirrored from the reference (behavior, not code):
  * overlapping patch embedding: conv stride < patch size
    (reference: coop.py:190-191 — stride 12 for 16px patches),
  * rectangular positional embedding of h_grid*w_grid+1 tokens
    (reference: coop.py:195),
  * triple-feature output (x11, x12, xproj): the layer-11 sequence, the
    final LayerNormed sequence, and its projection
    (reference: coop.py:203-227, maple.py:754-785),
  * shallow visual prompt tokens appended after the pos-embed, and per-layer
    deep prompt replacement for IVLP/MaPLe (reference: maple.py:765-767,
    maple.py:617-644),
  * JPM (jigsaw patch module) branch: shift+shuffle the patch tokens and
    re-run a dedicated copy of the last block (reference: jpm.py:6-39).

Layout is batch-first (B, S, D) and images are NHWC — natural for TPU; the
reference's LND permutes are a torch-ism with no math content.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu_reid.configs import VisionConfig
from tpu_reid.models import layers as L


def init_vit(key: jax.Array, cfg: VisionConfig) -> dict:
    ks = jax.random.split(key, 6)
    scale = cfg.width ** -0.5
    n_tok = cfg.h_grid * cfg.w_grid + 1
    params = {
        "conv": {
            # HWIO so lax.conv_general_dilated consumes it directly
            "w": scale * jax.random.normal(
                ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.width)
            )
        },
        "class_embedding": scale * jax.random.normal(ks[1], (cfg.width,)),
        "positional_embedding": scale * jax.random.normal(ks[2], (n_tok, cfg.width)),
        "ln_pre": L.init_layer_norm(cfg.width),
        "blocks": L.init_stack(ks[3], cfg.layers, cfg.width),
        "ln_post": L.init_layer_norm(cfg.width),
        "proj": scale * jax.random.normal(ks[4], (cfg.width, cfg.output_dim)),
    }
    d = cfg.design
    if d.has_vision_prompts:
        params["vpt_shallow"] = 0.02 * jax.random.normal(
            ks[5], (d.vision_ctx, cfg.width)
        )
        if d.vision_depth > 1 and d.trainer in ("IVLP", "VPT"):
            params["vpt_deep"] = 0.02 * jax.random.normal(
                jax.random.fold_in(ks[5], 1),
                (cfg.layers, d.vision_ctx, cfg.width),
            )
    return params


def _deep_prompt_flags(cfg: VisionConfig) -> jax.Array:
    """Layer i (>0) splices deep prompts iff i < vision_depth
    (reference gating `prompts_needed > i`, maple.py:535-541)."""
    i = jnp.arange(cfg.layers)
    return (i > 0) & (i < cfg.design.vision_depth)


def _patch_embed_conv(params: dict, cfg: VisionConfig, images: jax.Array) -> jax.Array:
    x = jax.lax.conv_general_dilated(
        images,
        params["conv"]["w"].astype(images.dtype),
        window_strides=(cfg.stride, cfg.stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params["conv"]:
        x = x + params["conv"]["b"].astype(x.dtype)
    b = x.shape[0]
    return x.reshape(b, cfg.h_grid * cfg.w_grid, cfg.width)


def _patch_embed_gemm(params: dict, cfg: VisionConfig, images: jax.Array) -> jax.Array:
    """Overlapping patch embed as a sum of pure gemms (exact conv math).

    A stride-s conv with kernel p > s cannot be a single reshape+matmul,
    but splitting the kernel at stride boundaries makes every piece
    non-overlapping: kernel rows [j*s, (j+1)*s) of output i read input
    rows i*s + j*s + [0, s) — a plain (out, s) reshape of a shifted image.
    For p=16/s=12 that is 2x2 kernel pieces -> 4 gemms with contraction
    dims (hj, wj, 3), all MXU-shaped. Measured on v5e at B=512/256x128:
    the strided-conv lowering costs ~3.5 ms; this decomposition runs the
    same 127 GFLOP as gemms (reference conv: coop.py:190-191)."""
    w = params["conv"]["w"].astype(images.dtype)  # (p, p, 3, width)
    p, s = cfg.patch_size, cfg.stride
    oh, ow = cfg.h_grid, cfg.w_grid
    b, ih, iw, c = images.shape
    acc = None
    for jy in range(-(-p // s)):
        h0 = jy * s
        hj = min(p - h0, s)
        rows = images[:, h0 : h0 + oh * s]
        if rows.shape[1] < oh * s:
            rows = jnp.pad(
                rows, [(0, 0), (0, oh * s - rows.shape[1]), (0, 0), (0, 0)]
            )
        rows = rows.reshape(b, oh, s, rows.shape[2], c)[:, :, :hj]
        for jx in range(-(-p // s)):
            w0 = jx * s
            wj = min(p - w0, s)
            cols = rows[:, :, :, w0 : w0 + ow * s]
            if cols.shape[3] < ow * s:
                cols = jnp.pad(
                    cols,
                    [(0, 0), (0, 0), (0, 0), (0, ow * s - cols.shape[3]),
                     (0, 0)],
                )
            cols = cols.reshape(b, oh, hj, ow, s, c)[:, :, :, :, :wj]
            y = jax.lax.dot_general(
                cols,
                w[h0 : h0 + hj, w0 : w0 + wj],
                dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, oh, ow, width)
            acc = y if acc is None else acc + y
    if "b" in params["conv"]:
        acc = acc + params["conv"]["b"].astype(acc.dtype)
    return acc.astype(images.dtype).reshape(b, oh * ow, cfg.width)


def patch_embed(params: dict, cfg: VisionConfig, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) -> (B, h_grid*w_grid, width) overlapping patch tokens.

    Uses the strided-conv lowering: measured HEAD-TO-HEAD on v5e at bench
    geometry (B=512, 256x128, p16/s12, bf16, under a K-batch scan) the conv
    runs 4.4 ms/batch vs 8.6 ms for the stride-boundary gemm decomposition —
    XLA's conv emitter wins; the gemm form pays for its sliced/padded
    intermediate materializations. The gemm decomposition is kept as the
    parity oracle (exact same math) and for backends without a fast conv."""
    return _patch_embed_conv(params, cfg, images)


def fold_visual_input_norm(visual: dict, model_type: str = "vit") -> dict:
    """Fold the eval input normalization into the patch-embed conv weights.

    normalize(u) = u/(255*std_c) - mean_c/std_c is affine and the patch
    embed is linear, so conv(normalize(u)) == conv_scaled(u) + bias with
    w' = w/(255*std_c), bias_o = -sum_khwc w[..,c,o]*mean_c/std_c — exact.
    Extraction then feeds RAW uint8-scale images (DevicePreprocess raw
    mode), eliminating the normalize pass (~3 ms/batch at B=512 on v5e, a
    full HBM round-trip of the image tensor). Bicubic resize and flips are
    linear/permutation ops that commute with the affine, so resized and
    TTA inputs stay exact. Cheap enough to run inside the jitted step
    (one (p, p, 3, width) rescale + einsum)."""
    from tpu_reid.data.transforms import norm_stats

    mean, std = norm_stats(model_type)
    conv = visual["conv"]
    assert "b" not in conv, "input norm already folded"
    w32 = conv["w"].astype(jnp.float32)
    s = 1.0 / (255.0 * jnp.asarray(std, jnp.float32))
    t = -jnp.asarray(mean, jnp.float32) / jnp.asarray(std, jnp.float32)
    out = dict(visual)
    out["conv"] = {
        "w": (w32 * s[None, None, :, None]).astype(conv["w"].dtype),
        "b": jnp.einsum("hwco,c->o", w32, t),
    }
    return out


def apply_vit(
    params: dict,
    cfg: VisionConfig,
    images: jax.Array,
    deep_prompts: Optional[jax.Array] = None,
    shallow_prompt: Optional[jax.Array] = None,
    cv_emb: Optional[jax.Array] = None,
    cls_only: bool = False,
    jpm_params: Optional[dict] = None,
) -> tuple[jax.Array, ...]:
    """Forward pass. Returns (x11, x12, xproj) full sequences; callers take
    [:, 0] for the CLS features (reference: prompt_learning.py:114).

    deep_prompts/shallow_prompt override params["vpt_deep"/"vpt_shallow"] —
    MaPLe passes externally projected prompts here (reference:
    maple.py:809-844).

    cls_only=True runs the final block, ln_post and the projection on the
    CLS position only (x12/xproj come back as (B, 1, ...)) — exact for
    every caller that consumes [:, 0], and ~6% cheaper end to end.

    jpm_params adds the jigsaw-patch branch on the final pre-LN sequence
    and returns a 4-tuple (x11, x12, xproj, jpm_seq), the JPM tower
    contract (reference: coop.py:230-277 returns the same 4-tuple). The
    final block always runs on the full sequence (JPM consumes its full
    output); with cls_only the ln_post/proj tail still narrows to the CLS
    row.
    """
    x = patch_embed(params, cfg, images)
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.width)
    )
    if cv_emb is not None:
        cls = cls + cv_emb.astype(x.dtype)[:, None, :]
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(x.dtype)

    if cfg.design.has_vision_prompts:
        vpt = (
            shallow_prompt if shallow_prompt is not None
            else params["vpt_shallow"]
        ).astype(x.dtype)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(vpt, (b,) + vpt.shape)], axis=1
        )

    x = L.layer_norm(params["ln_pre"], x)

    dp = deep_prompts if deep_prompts is not None else params.get("vpt_deep")
    flags = _deep_prompt_flags(cfg) if dp is not None else None
    n_layers = cfg.layers

    # blocks 0..L-2 via scan, final block separately for the x11/x12 split
    # (reference: maple.py:775-776).
    head = L.slice_layer(params["blocks"], slice(0, n_layers - 1))
    tail = L.slice_layer(params["blocks"], n_layers - 1)
    x11 = L.transformer_stack(
        head,
        x,
        cfg.heads,
        deep_prompts=None if dp is None else dp[: n_layers - 1],
        prompt_flags=None if flags is None else flags[: n_layers - 1],
        text_side=False,
    )
    x_last = x11
    if dp is not None:
        spliced = L.splice_prompt_tokens(x_last, dp[n_layers - 1], text_side=False)
        x_last = jnp.where(flags[n_layers - 1], spliced, x_last)
    if jpm_params is not None:
        x12_pre = L.residual_block(tail, x_last, cfg.heads)
        jpm_seq = apply_jpm(jpm_params, cfg, x12_pre)
        if cls_only:
            x12_pre = x12_pre[:, :1]
        x12 = L.layer_norm(params["ln_post"], x12_pre)
        xproj = jnp.dot(x12, params["proj"].astype(x12.dtype))
        return x11, x12, xproj, jpm_seq
    if cls_only:
        x12 = L.residual_block_cls(tail, x_last, cfg.heads)
        # fused ln_post + proj on the CLS row: both consumers of the final
        # CLS (x12 LayerNormed, x12 @ proj — reference maple.py:780-783)
        # from one VMEM-resident load (Pallas on TPU bf16, XLA elsewhere)
        from tpu_reid.ops.fused_tail import ln_proj_tail

        y, pr = ln_proj_tail(x12[:, 0], params["ln_post"], params["proj"])
        return x11, y[:, None], pr[:, None]
    x12 = L.residual_block(tail, x_last, cfg.heads)
    x12 = L.layer_norm(params["ln_post"], x12)
    xproj = jnp.dot(x12, params["proj"].astype(x12.dtype))
    return x11, x12, xproj


# ---------------------------------------------------------------------------
# JPM — jigsaw patch module (TransReID)
# ---------------------------------------------------------------------------


def shuffle_unit(features: jax.Array, shift: int, group: int) -> jax.Array:
    """Token shift + grouped shuffle over the patch axis.

    Intended TransReID semantics (reference: jpm.py:6-23). The reference's
    `begin=1` indexing silently drops patch 0 and its 2D/3D concat crashes if
    reached; we implement the documented intent: circular shift by `shift`
    over all patch tokens, then group-transpose. Divergence recorded per
    SURVEY.md §7 ("reproduce behavior, not bugs").
    """
    b, s, d = features.shape
    x = jnp.roll(features, -shift, axis=1)
    if group > 1:
        pad = (-s) % group
        if pad:
            x = jnp.concatenate([x, x[:, -pad:]], axis=1)
        x = x.reshape(b, group, -1, d).transpose(0, 2, 1, 3).reshape(b, -1, d)
    return x


def init_jpm(params_vit: dict, cfg: VisionConfig) -> dict:
    """JPM owns a copy of the last block + final LN (reference: jpm.py:27-32)."""
    last = L.slice_layer(params_vit["blocks"], cfg.layers - 1)
    return {
        "block": jax.tree.map(jnp.array, last),
        "ln": jax.tree.map(jnp.array, params_vit["ln_post"]),
    }


def apply_jpm(
    jpm_params: dict, cfg: VisionConfig, x12_pre_ln: jax.Array,
    shift: int = 5, group: int = 1,
) -> jax.Array:
    """Shuffled-patch branch on the final token sequence (reference: jpm.py:34-39)."""
    cls = x12_pre_ln[:, :1]
    patches = shuffle_unit(x12_pre_ln[:, 1:], shift, group)
    x = jnp.concatenate([cls, patches], axis=1)
    x = L.residual_block(jpm_params["block"], x, cfg.heads)
    return L.layer_norm(jpm_params["ln"], x)
