"""Training losses — supervised contrastive, batch-hard triplet (incl. the
cross-batch-memory variant), and label-smoothed cross entropy.

Behavioral contracts (reference: losses.py):
  * supcon_loss — text<->image supervised contrastive at temperature 1.0 with
    a label-equality positive mask and log-sum-exp stabilization
    (losses.py:155-176); applied in both directions in stage 1
    (prompt_learning.py:445-448).
  * triplet_loss — batch-hard mining (hardest positive = max distance,
    hardest negative = min distance) over a euclidean distance matrix with
    sqrt clamped at 1e-12 (losses.py:14-28, :31-83). margin=0.3 gives the
    MarginRankingLoss form mean(relu(d_ap - d_an + margin)); margin=None the
    SoftMarginLoss form mean(softplus(d_ap - d_an)) (losses.py:86-108).
    The reference's boolean-gather mining assumes the PK sampler's equal
    samples-per-identity; the masked max/min here computes the same hardest
    pairs without that restriction.
  * triplet_loss_xbm — anchors vs a memory bank of features; self-matches are
    excluded via an explicit column mask instead of the reference's
    first-N-columns eye subtraction (losses.py:131), which silently assumed
    the batch sat at the start of the ring buffer. Divergence documented per
    SURVEY.md §7.
  * cross_entropy_label_smooth — ε=0.1 smoothing, `mean(0).sum()` reduction
    (losses.py:179-209).

All functions are pure and jit-safe (static shapes, fp32 internals).

Every loss takes an optional `valid` mask (B,) bool: padded rows (from a
static-shape batch loader's tail batch) contribute nothing to the value or
the gradient. The reference never needs this — torch loaders yield ragged
tail batches — so masked-off behavior is defined here as "identical to
slicing the padding away".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    if valid is None:
        return jnp.mean(x)
    v = valid.astype(jnp.float32)
    return jnp.sum(x * v) / jnp.maximum(jnp.sum(v), 1.0)


def euclidean_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise euclidean distance with the reference's 1e-12 clamp before
    sqrt (losses.py:14-28)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    sq = (
        jnp.sum(x * x, axis=1, keepdims=True)
        + jnp.sum(y * y, axis=1, keepdims=True).T
        - 2.0 * x @ y.T
    )
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


def batch_hard_mining(
    dist: jax.Array, labels: jax.Array, labels_cols: Optional[jax.Array] = None,
    exclude_cols: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Hardest positive (max dist) and hardest negative (min dist) per row.

    labels_cols defaults to labels (square batch case). exclude_cols is an
    optional (N, M) bool mask of columns to ignore entirely (XBM self-match
    exclusion)."""
    if labels_cols is None:
        labels_cols = labels
    is_pos = labels[:, None] == labels_cols[None, :]
    is_neg = ~is_pos
    if exclude_cols is not None:
        is_pos = is_pos & ~exclude_cols
        is_neg = is_neg & ~exclude_cols
    neg_inf = jnp.float32(-1e30)
    pos_inf = jnp.float32(1e30)
    d_ap = jnp.max(jnp.where(is_pos, dist, neg_inf), axis=1)
    d_an = jnp.min(jnp.where(is_neg, dist, pos_inf), axis=1)
    return d_ap, d_an


def _ranking_loss(
    d_ap: jax.Array, d_an: jax.Array, margin: Optional[float],
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    if margin is not None:
        return _masked_mean(jax.nn.relu(d_ap - d_an + margin), valid)
    return _masked_mean(jax.nn.softplus(d_ap - d_an), valid)


def triplet_loss(
    feat: jax.Array,
    labels: jax.Array,
    margin: Optional[float] = 0.3,
    normalize_feature: bool = False,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    if normalize_feature:
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    dist = euclidean_dist(feat, feat)
    exclude = None
    if valid is not None:
        # padded rows are neither anchors (masked mean) nor candidates
        exclude = jnp.broadcast_to(~valid[None, :], dist.shape)
    d_ap, d_an = batch_hard_mining(dist, labels, exclude_cols=exclude)
    return _ranking_loss(d_ap, d_an, margin, valid)


def triplet_loss_xbm(
    feat: jax.Array,
    labels: jax.Array,
    feat_xbm: jax.Array,
    labels_xbm: jax.Array,
    margin: Optional[float] = None,
    self_cols: Optional[jax.Array] = None,
    valid_cols: Optional[jax.Array] = None,
    normalize_feature: bool = False,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Anchors vs memory bank. self_cols: (N,) int column index of each
    anchor's own slot in the bank (excluded from mining). valid_cols: (M,)
    bool mask of filled bank slots (unfilled slots excluded). valid: (N,)
    anchor-row mask (padded anchors excluded from the mean)."""
    if normalize_feature:
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        feat_xbm = feat_xbm / jnp.linalg.norm(feat_xbm, axis=-1, keepdims=True)
    dist = euclidean_dist(feat, feat_xbm)
    m = feat_xbm.shape[0]
    exclude = None
    if self_cols is not None:
        exclude = self_cols[:, None] == jnp.arange(m)[None, :]
    if valid_cols is not None:
        invalid = jnp.broadcast_to(~valid_cols[None, :], dist.shape)
        exclude = invalid if exclude is None else (exclude | invalid)
    d_ap, d_an = batch_hard_mining(dist, labels, labels_xbm, exclude)
    return _ranking_loss(d_ap, d_an, margin, valid)


def supcon_loss(
    anchor_features: jax.Array,
    contrast_features: jax.Array,
    anchor_labels: jax.Array,
    contrast_labels: jax.Array,
    temperature: float = 1.0,
    anchor_valid: Optional[jax.Array] = None,
    contrast_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Supervised contrastive loss between two feature sets
    (reference: losses.py:155-176). Callers are expected to pass
    L2-normalized features, as the reference trainers do. Invalid contrast
    columns drop out of both the positive mask and the denominator; invalid
    anchor rows drop out of the mean."""
    a = anchor_features.astype(jnp.float32)
    c = contrast_features.astype(jnp.float32)
    mask = (anchor_labels[:, None] == contrast_labels[None, :]).astype(
        jnp.float32
    )
    logits = (a @ c.T) / temperature
    if contrast_valid is not None:
        mask = mask * contrast_valid[None, :].astype(jnp.float32)
        logits = jnp.where(contrast_valid[None, :], logits, -1e30)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=1, keepdims=True)
    )
    log_prob = logits - jnp.log(
        jnp.sum(jnp.exp(logits), axis=1, keepdims=True)
    )
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-12
    )
    return -_masked_mean(mean_log_prob_pos, anchor_valid)


def cross_entropy_label_smooth(
    logits: jax.Array,
    labels: jax.Array,
    epsilon: float = 0.1,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """ε-smoothed CE with the reference's mean-over-batch / sum-over-class
    reduction (losses.py:179-209)."""
    n_cls = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = jax.nn.one_hot(labels, n_cls, dtype=jnp.float32)
    targets = (1.0 - epsilon) * targets + epsilon / n_cls
    per_row = jnp.sum(-targets * log_probs, axis=-1)
    return _masked_mean(per_row, valid)


def cross_entropy(
    logits: jax.Array, labels: jax.Array, valid: Optional[jax.Array] = None
) -> jax.Array:
    """Plain CE (the image-text logits term, prompt_learning.py:492-495)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_row = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    return _masked_mean(per_row, valid)
