"""ModifiedResNet (CLIP RN50-style) vision tower — functional, TPU-first.

Capabilities mirrored from the reference (behavior, not code):
  * 3-conv anti-aliased stem with a final 2x2 average pool
    (reference: custom_clip_model.py:189-206, maple.py:472-498),
  * Bottleneck blocks where all strides are average pools ("blur pool"
    style): stride-2 happens via avg_pool before conv3 and in the
    downsample branch (reference: maple.py:370-414),
  * ReID variant: layer4 runs at stride 1 so the final feature map keeps
    16x-downsampled resolution (reference: custom_clip_model.py:214),
  * attention pooling head with a mean-token query and a rectangular
    (h_grid*w_grid + 1) positional embedding
    (reference: custom_clip_model.py:149-183),
  * triple-feature output (x3, x4, xproj): the layer-3 map, the layer-4 map,
    and the attention-pooled token sequence projected to the embed dim
    (reference: custom_clip_model.py:238-242).

All convolutions are NHWC/HWIO (TPU-native layouts). BatchNorm is a pure
function of explicit state; `train=True` normalizes with batch statistics
and returns updated running stats alongside the output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_reid.configs import ResNetConfig
from tpu_reid.models import layers as L

EXPANSION = 4


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _conv(key, kh, kw, cin, cout) -> dict:
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout)) * (2.0 / fan_in) ** 0.5
    return {"w": w}


def conv2d(p: dict, x: jax.Array, stride: int = 1, padding="SAME") -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def init_bn(c: int) -> dict:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def batch_norm(
    p: dict, x: jax.Array, train: bool = False, eps: float = 1e-5,
    momentum: float = 0.1, valid=None,
) -> Tuple[jax.Array, Optional[dict]]:
    """BatchNorm over all axes but the channel (last) axis, fp32 statistics.

    Returns (y, new_stats) where new_stats is None at inference and the
    momentum-updated {mean, var} in train mode (torch convention:
    new = (1 - m) * running + m * batch, unbiased var for the update).

    valid: optional (B,) bool mask (leading-axis rows) — padded rows are
    excluded from the batch statistics, so a padded batch normalizes its
    real rows exactly as the unpadded batch would.
    """
    x32 = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        if valid is not None:
            shape = (valid.shape[0],) + (1,) * (x.ndim - 1)
            w = valid.astype(jnp.float32).reshape(shape)
            n = jnp.maximum(
                jnp.sum(w) * (x32.size // x32.shape[-1] // valid.shape[0]),
                1.0,
            )
            mean = jnp.sum(x32 * w, axis=axes) / n
            var = jnp.sum(jnp.square(x32 - mean) * w, axis=axes) / n
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        else:
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            n = x32.size // x32.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = None
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_stats


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


# ---------------------------------------------------------------------------
# bottleneck
# ---------------------------------------------------------------------------


def init_bottleneck(key, cin: int, planes: int, stride: int) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv(ks[0], 1, 1, cin, planes),
        "bn1": init_bn(planes),
        "conv2": _conv(ks[1], 3, 3, planes, planes),
        "bn2": init_bn(planes),
        "conv3": _conv(ks[2], 1, 1, planes, planes * EXPANSION),
        "bn3": init_bn(planes * EXPANSION),
    }
    if stride > 1 or cin != planes * EXPANSION:
        p["down_conv"] = _conv(ks[3], 1, 1, cin, planes * EXPANSION)
        p["down_bn"] = init_bn(planes * EXPANSION)
    return p


def apply_bottleneck(p: dict, x: jax.Array, stride: int) -> jax.Array:
    out, _ = batch_norm(p["bn1"], conv2d(p["conv1"], x))
    out = jax.nn.relu(out)
    out, _ = batch_norm(p["bn2"], conv2d(p["conv2"], out))
    out = jax.nn.relu(out)
    if stride > 1:
        out = avg_pool(out, stride)
    out, _ = batch_norm(p["bn3"], conv2d(p["conv3"], out))

    identity = x
    if "down_conv" in p:
        if stride > 1:
            identity = avg_pool(identity, stride)
        identity, _ = batch_norm(p["down_bn"], conv2d(p["down_conv"], identity))
    return jax.nn.relu(out + identity)


# ---------------------------------------------------------------------------
# attention pool
# ---------------------------------------------------------------------------


def init_attnpool(key, n_tokens: int, embed_dim: int, output_dim: int) -> dict:
    ks = jax.random.split(key, 5)
    std = embed_dim ** -0.5
    return {
        "positional_embedding": std * jax.random.normal(
            ks[0], (n_tokens + 1, embed_dim)
        ),
        "q_proj": {"w": std * jax.random.normal(ks[1], (embed_dim, embed_dim)),
                   "b": jnp.zeros((embed_dim,))},
        "k_proj": {"w": std * jax.random.normal(ks[2], (embed_dim, embed_dim)),
                   "b": jnp.zeros((embed_dim,))},
        "v_proj": {"w": std * jax.random.normal(ks[3], (embed_dim, embed_dim)),
                   "b": jnp.zeros((embed_dim,))},
        "c_proj": {"w": std * jax.random.normal(ks[4], (embed_dim, output_dim)),
                   "b": jnp.zeros((output_dim,))},
    }


def apply_attnpool(p: dict, x: jax.Array, n_heads: int) -> jax.Array:
    """(B, H, W, C) -> (B, 1+HW, output_dim) attended token sequence.

    Token 0 is the mean-pooled query token — callers take [:, 0] as the
    global feature (reference: custom_clip_model.py:170-183 returns the
    full sequence and the ReID head avg-pools / indexes it).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)

    s = x.shape[1]
    dh = c // n_heads
    q = L.linear(p["q_proj"], x).reshape(b, s, n_heads, dh).transpose(0, 2, 1, 3)
    k = L.linear(p["k_proj"], x).reshape(b, s, n_heads, dh).transpose(0, 2, 1, 3)
    v = L.linear(p["v_proj"], x).reshape(b, s, n_heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(dh)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
    return L.linear(p["c_proj"], out)


# ---------------------------------------------------------------------------
# full tower
# ---------------------------------------------------------------------------


def _layer_strides(cfg: ResNetConfig) -> Tuple[int, int, int, int]:
    # ReID variant: layer4 stride 1 (reference: custom_clip_model.py:214).
    return (1, 2, 2, cfg.layer4_stride)


def init_resnet(key: jax.Array, cfg: ResNetConfig) -> dict:
    w = cfg.width
    ks = jax.random.split(key, 8)
    params = {
        "conv1": _conv(ks[0], 3, 3, 3, w // 2),
        "bn1": init_bn(w // 2),
        "conv2": _conv(ks[1], 3, 3, w // 2, w // 2),
        "bn2": init_bn(w // 2),
        "conv3": _conv(ks[2], 3, 3, w // 2, w),
        "bn3": init_bn(w),
    }
    strides = _layer_strides(cfg)
    cin = w
    for i, (blocks, stride) in enumerate(zip(cfg.layers, strides)):
        planes = w * (2 ** i)
        layer = []
        bks = jax.random.split(ks[3 + i], blocks)
        for j in range(blocks):
            layer.append(
                init_bottleneck(bks[j], cin, planes, stride if j == 0 else 1)
            )
            cin = planes * EXPANSION
        params[f"layer{i + 1}"] = layer
    embed_dim = w * 32
    params["attnpool"] = init_attnpool(
        ks[7], cfg.h_grid * cfg.w_grid, embed_dim, cfg.output_dim
    )
    return params


def apply_resnet(
    params: dict, cfg: ResNetConfig, images: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Forward pass. Returns (x3, x4, xproj):
    layer-3 feature map (B, h, w, C3), layer-4 map (B, h, w, C4), and the
    attention-pooled sequence (B, 1+hw, output_dim)
    (reference triple contract: custom_clip_model.py:238-242)."""
    x = images
    x, _ = batch_norm(params["bn1"], conv2d(params["conv1"], x, stride=2))
    x = jax.nn.relu(x)
    x, _ = batch_norm(params["bn2"], conv2d(params["conv2"], x))
    x = jax.nn.relu(x)
    x, _ = batch_norm(params["bn3"], conv2d(params["conv3"], x))
    x = jax.nn.relu(x)
    x = avg_pool(x, 2)

    strides = _layer_strides(cfg)
    feats = {}
    for i in range(4):
        layer = params[f"layer{i + 1}"]
        for j, block in enumerate(layer):
            x = apply_bottleneck(block, x, strides[i] if j == 0 else 1)
        feats[i] = x
    xproj = apply_attnpool(params["attnpool"], x, cfg.heads)
    return feats[2], feats[3], xproj
