"""Pairwise distance matrices, computed on device.

TPU-native replacement for the reference's host-side distance math
(reference: evaluate.py:7-26, losses.py:14-28). Everything here is jittable,
static-shape, and keeps features in HBM; the squared-distance expansion
``|q|^2 + |g|^2 - 2 q.g`` maps the O(QGD) work onto the MXU as one matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Row-normalize features (reference: evaluate.py:114, torch F.normalize)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def euclidean_distmat(q: jax.Array, g: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix (Q, G).

    Matches the reference protocol (evaluate.py:7-13), which never takes the
    sqrt — ranking is monotonic in the squared distance. The cross term is a
    single (Q,D)x(D,G) matmul -> MXU.
    """
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    q_sq = jnp.sum(jnp.square(q), axis=1, keepdims=True)  # (Q, 1)
    g_sq = jnp.sum(jnp.square(g), axis=1, keepdims=True).T  # (1, G)
    # HIGHEST precision: ranking parity requires true fp32 accumulation, not
    # the MXU's default bf16 input rounding.
    cross = jnp.dot(q, g.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return q_sq + g_sq - 2.0 * cross


def euclidean_dist_safe(x: jax.Array, y: jax.Array) -> jax.Array:
    """Euclidean (non-squared) distance with clamping, for triplet mining.

    Reference: losses.py:14-28 (clamp 1e-12 then sqrt).
    """
    d2 = euclidean_distmat(x, y)
    return jnp.sqrt(jnp.clip(d2, min=1e-12))


def cosine_distmat(q: jax.Array, g: jax.Array, eps: float = 1e-5) -> jax.Array:
    """arccos of the normalized dot product (reference: evaluate.py:16-26)."""
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)
    sim = jnp.dot(l2_normalize(q), l2_normalize(g).T,
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    sim = jnp.clip(sim, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(sim)
