"""Optimizer plumbing: parameter partitions, torch-style Adam, GPA averaging.

The reference freezes/unfreezes via `requires_grad_` flags and per-param
torch param groups (reference: prompt_learning.py:396-402, :526-543). Here
a path predicate splits the params pytree into (trainable, frozen); grads
are taken over the trainable subtree only, so frozen weights never even
get gradient buffers.

torch.optim.Adam's weight_decay is coupled L2 (decay added to the gradient
BEFORE the Adam moments) — that is optax.add_decayed_weights placed before
scale_by_adam, not adamw. The stage-2 "bias lr x2" param group is a linear
post-scale on bias-leaf updates (Adam's update is linear in lr).

GPA (Gaussian-weighted prompt averaging, PromptSRC) keeps a running
gauss-weighted sum of the full params pytree and swaps it in at the end
(reference: prompt_learning.py:335-353, :416-470).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# pytree partition by key-path predicate
# ---------------------------------------------------------------------------


def _paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _paths(v, prefix + (str(i),))
    else:
        yield prefix, tree


def partition(params, predicate: Callable[[Tuple[str, ...]], bool]):
    """Split into (trainable, frozen) trees of identical structure, with
    None at the complementary positions (jit-friendly: None is a leaf-less
    subtree for jax)."""

    def split(tree, prefix, keep):
        if isinstance(tree, dict):
            return {k: split(v, prefix + (k,), keep) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(
                split(v, prefix + (str(i),), keep) for i, v in enumerate(tree)
            )
        return tree if predicate(prefix) == keep else None

    return split(params, (), True), split(params, (), False)


def combine(trainable, frozen):
    """Inverse of partition."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if isinstance(trainable, dict):
        return {k: combine(trainable[k], frozen[k]) for k in trainable}
    if isinstance(trainable, (list, tuple)):
        return type(trainable)(
            combine(a, b) for a, b in zip(trainable, frozen)
        )
    raise ValueError("overlapping leaves in partition")


def count_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for _, x in _paths(tree) if x is not None)


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------


def torch_adam(
    learning_rate, weight_decay: float = 0.0, bias_lr_mult: float = 1.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
):
    """torch.optim.Adam semantics with optional bias-leaf lr multiplier.

    learning_rate may be a float or a schedule-injected hyperparam; wrap
    with optax.inject_hyperparams to drive it per epoch from host code."""
    chain = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if bias_lr_mult != 1.0:
        def scale_bias(updates):
            def walk(tree, mult_tree=None):
                return jax.tree_util.tree_map_with_path(
                    lambda path, u: u * bias_lr_mult
                    if any(
                        getattr(p, "key", None) in ("b", "bias")
                        for p in path
                    )
                    else u,
                    tree,
                )
            return walk(updates)

        chain.append(
            optax.stateless(lambda updates, params=None: scale_bias(updates))
        )
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


class FlatAdamState(NamedTuple):
    count: jax.Array
    m: jax.Array
    v: jax.Array
    mult: jax.Array  # per-element lr multiplier (bias_lr_mult on bias leaves)


def flat_torch_adam(
    learning_rate, weight_decay: float = 0.0, bias_lr_mult: float = 1.0,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
):
    """torch_adam with the moment math on ONE flattened vector.

    Identical update rule to `torch_adam` (coupled-L2 decay before the
    moments, bias-corrected Adam, bias-leaf lr multiplier), exact-match
    tested. Built to attack the ~19 ms/step optimizer overhead the r5
    probe D measured (grad 69.5 -> grad+adam 88.2 ms chained at ViT-B
    bs=64) — but MEASURED SLOWER in the full step (89.7 -> 98.9 ms):
    the concat barrier serializes the update behind the whole backward,
    losing the per-leaf overlap XLA otherwise schedules. Not the
    default; see make_stage_optimizer."""

    def _flat(tree):
        return jnp.concatenate(
            [jnp.ravel(leaf) for leaf in jax.tree.leaves(tree)]
        )

    def init(params):
        leaves_p = jax.tree_util.tree_flatten_with_path(params)[0]
        mult = jnp.concatenate([
            jnp.full(
                (np.prod(np.shape(leaf)) or 1,),
                bias_lr_mult if any(
                    getattr(p, "key", None) in ("b", "bias") for p in path
                ) else 1.0,
                jnp.float32,
            )
            for path, leaf in leaves_p
        ])
        n = mult.shape[0]
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros((n,), jnp.float32),
            v=jnp.zeros((n,), jnp.float32),
            mult=mult,
        )

    def update(updates, state, params=None):
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        shapes = [np.shape(leaf) for leaf in leaves]
        sizes = [int(np.prod(s) or 1) for s in shapes]
        g = _flat(updates).astype(jnp.float32)
        if weight_decay:
            assert params is not None
            g = g + weight_decay * _flat(params).astype(jnp.float32)
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mhat = m / (1.0 - b1 ** c)
        vhat = v / (1.0 - b2 ** c)
        flat_u = (-learning_rate) * state.mult * (
            mhat / (jnp.sqrt(vhat) + eps)
        )
        parts = jnp.split(flat_u, np.cumsum(sizes)[:-1]) if sizes else []
        out = [
            p.reshape(s).astype(leaf.dtype)
            for p, s, leaf in zip(parts, shapes, leaves)
        ]
        return (
            jax.tree_util.tree_unflatten(treedef, out),
            FlatAdamState(count=count, m=m, v=v, mult=state.mult),
        )

    return optax.GradientTransformation(init, update)


def make_stage_optimizer(
    base_lr: float, weight_decay: float = 1e-4, bias_lr_mult: float = 1.0,
    flat: bool = False,
):
    """inject_hyperparams wrapper so trainers set opt_state.hyperparams
    ['learning_rate'] from the epoch schedule (reference steps its torch
    schedulers per epoch).

    flat=False (default): the per-leaf optax chain. flat=True swaps in
    `flat_torch_adam` (same math, exact-match tested) — built on the
    r5 probe-D observation that grad->grad+adam costs ~19 ms/step at
    ViT-B bs=64, but MEASURED SLOWER end-to-end (chained step 89.7 ->
    98.9 ms): concatenating 86M params serializes the optimizer behind
    the complete backward, losing XLA's overlap of per-leaf updates with
    the backward's tail, which outweighs the per-kernel overhead it
    removes. Kept as the recorded dead end (ROADMAP) and equality
    oracle."""
    fn = flat_torch_adam if flat else torch_adam
    return optax.inject_hyperparams(
        fn,
        static_args=("weight_decay", "bias_lr_mult", "b1", "b2", "eps"),
    )(
        learning_rate=base_lr,
        weight_decay=weight_decay,
        bias_lr_mult=bias_lr_mult,
    )


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


# ---------------------------------------------------------------------------
# GPA — gaussian-weighted parameter averaging (PromptSRC)
# ---------------------------------------------------------------------------


def gauss_weights(mu: float, sigma: float, max_epochs: int) -> np.ndarray:
    """Normalized gaussian over epochs 1..max_epochs
    (reference: prompt_learning.py:329-333)."""
    xs = np.arange(1, max_epochs + 1, dtype=np.float64)
    g = np.exp(-0.5 * ((xs - mu) / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi))
    return g / g.sum()


def gpa_update(gpa_sum, params, weight: float):
    """Running sum += weight * params (reference: prompt_learning.py:460-466).

    Non-float leaves (integer buffers like EOT indices) pass through with
    their latest value instead of being averaged."""

    def is_float(p):
        return jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)

    scaled = jax.tree.map(lambda p: p * weight if is_float(p) else p, params)
    if gpa_sum is None:
        return scaled
    return jax.tree.map(
        lambda s, p: s + p if is_float(p) else p, gpa_sum, scaled
    )
