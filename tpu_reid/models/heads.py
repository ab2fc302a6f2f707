"""ReID heads: BNNeck, ID classifiers, CLIP-Adapter bottleneck.

Behavioral contracts from the reference:
  * BNNeck — a BatchNorm1d whose bias is frozen at zero, applied to the
    backbone feature before the ID classifier; retrieval uses the
    post-BN feature (reference: utils.py:128-142, "bias.requires_grad_(False)").
  * Classifier — paired (768-d and 512-d) BNNeck + bias-free linear ID heads
    with kaiming/normal init (reference:
    prompt_learning_multitask_hard_sharing.py:107-127).
  * Adapter — 768->768/4->768 ReLU MLP without biases, residual-blended at
    ratio 0.2 into the non-projected image feature
    (reference: clip_adapter.py:64-76, prompt_learning.py:241-242).

BatchNorm1d is the functional `batch_norm` from models.resnet; train-mode
callers thread the updated running stats through their optimizer state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_reid.models.resnet import batch_norm, init_bn


def init_bnneck(dim: int) -> dict:
    return init_bn(dim)


def apply_bnneck(
    p: dict, x: jax.Array, train: bool = False, valid=None
) -> Tuple[jax.Array, Optional[dict]]:
    """BatchNorm1d over (B, D). The bias entry is kept frozen at zero by the
    trainer's param filter (see train/optim.py), matching the reference."""
    return batch_norm(p, x, train=train, valid=valid)


def init_classifier_head(key: jax.Array, dim: int, n_classes: int) -> dict:
    # normal(std=0.001) classifier init (reference convention for ID heads,
    # prompt_learning_multitask_hard_sharing.py:115-121).
    return {"w": 0.001 * jax.random.normal(key, (dim, n_classes))}


def apply_classifier_head(p: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"].astype(x.dtype))


def init_classifier(
    key: jax.Array, n_classes: int, dim_nonproj: int = 768, dim_proj: int = 512
) -> dict:
    """Shared BNNeck head pair: one for the non-projected (768) feature, one
    for the projected (512) feature."""
    k1, k2 = jax.random.split(key)
    return {
        "bn": init_bnneck(dim_nonproj),
        "bn_proj": init_bnneck(dim_proj),
        "cls": init_classifier_head(k1, dim_nonproj, n_classes),
        "cls_proj": init_classifier_head(k2, dim_proj, n_classes),
    }


def apply_classifier(
    p: dict, feat: jax.Array, feat_proj: jax.Array, train: bool = False,
    valid=None,
) -> dict:
    """Returns dict with post-BN features and ID logits for both levels."""
    bn_feat, bn_stats = apply_bnneck(p["bn"], feat, train, valid=valid)
    bn_proj, bn_proj_stats = apply_bnneck(
        p["bn_proj"], feat_proj, train, valid=valid
    )
    return {
        "bn_feat": bn_feat,
        "bn_feat_proj": bn_proj,
        "logits": apply_classifier_head(p["cls"], bn_feat),
        "logits_proj": apply_classifier_head(p["cls_proj"], bn_proj),
        "new_stats": {"bn": bn_stats, "bn_proj": bn_proj_stats},
    }


# ---------------------------------------------------------------------------
# CLIP-Adapter
# ---------------------------------------------------------------------------


def init_adapter(key: jax.Array, dim: int = 768, reduction: int = 4) -> dict:
    k1, k2 = jax.random.split(key)
    hid = dim // reduction
    s1 = (2.0 / dim) ** 0.5
    s2 = (2.0 / hid) ** 0.5
    return {
        "fc1": {"w": s1 * jax.random.normal(k1, (dim, hid))},
        "fc2": {"w": s2 * jax.random.normal(k2, (hid, dim))},
    }


def apply_adapter(p: dict, x: jax.Array, ratio: float = 0.2) -> jax.Array:
    """Residual adapter blend: ratio*mlp(x) + (1-ratio)*x
    (reference: prompt_learning.py:241-242, ratio 0.2)."""
    h = jax.nn.relu(jnp.dot(x, p["fc1"]["w"].astype(x.dtype)))
    h = jax.nn.relu(jnp.dot(h, p["fc2"]["w"].astype(x.dtype)))
    return ratio * h + (1.0 - ratio) * x
