"""XBM — cross-batch memory of embedding + label pairs.

Functional ring buffer mirroring the reference's XBM (reference:
prompt_learning_multitask_hard_sharing.py:78-104): fixed capacity
(2 x batch in the reference), enqueue_dequeue semantics, `is_full` gate.

Divergences (documented per SURVEY.md §7):
  * validity is tracked with an explicit fill counter instead of the
    reference's `0 * -1` zero-init sentinel, whose `is_full` misfires until
    wraparound (reference: :81-84, labels init to 0, checked against -1),
  * enqueue returns the slots the batch landed in so the XBM triplet loss
    can exclude exact self-matches (reference assumes the batch is always
    the first N columns, :131).

State is a plain dict of jnp arrays — donate/carry it through jitted steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_xbm(capacity: int, dim: int, dtype=jnp.float32) -> dict:
    return {
        "feats": jnp.zeros((capacity, dim), dtype),
        "labels": jnp.full((capacity,), -1, jnp.int32),
        "ptr": jnp.zeros((), jnp.int32),
        "filled": jnp.zeros((), jnp.int32),
    }


def xbm_enqueue(
    state: dict, feats: jax.Array, labels: jax.Array, valid=None
) -> Tuple[dict, jax.Array]:
    """Write a batch at the ring pointer. Returns (new_state, slots) where
    slots[i] is the buffer position of feats[i].

    valid: optional (B,) bool mask — padded rows still consume ring slots
    (static shapes) but are stored with label -1, which `xbm_get` reports
    as invalid so they never enter the mining."""
    cap = state["feats"].shape[0]
    b = feats.shape[0]
    assert b <= cap, "batch larger than XBM capacity"
    if valid is not None:
        labels = jnp.where(valid, labels, -1)
    slots = (state["ptr"] + jnp.arange(b)) % cap
    new = {
        "feats": state["feats"].at[slots].set(
            jax.lax.stop_gradient(feats).astype(state["feats"].dtype)
        ),
        "labels": state["labels"].at[slots].set(labels.astype(jnp.int32)),
        "ptr": (state["ptr"] + b) % cap,
        "filled": jnp.minimum(state["filled"] + b, cap),
    }
    return new, slots


def xbm_is_full(state: dict) -> jax.Array:
    return state["filled"] >= state["feats"].shape[0]


def xbm_get(state: dict) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(feats, labels, valid_mask). Unfilled slots — and slots a padded row
    was enqueued into (label -1) — are reported invalid; callers must mask
    them out of the mining via the valid mask."""
    cap = state["feats"].shape[0]
    valid = (jnp.arange(cap) < state["filled"]) & (state["labels"] >= 0)
    return state["feats"], state["labels"], valid
