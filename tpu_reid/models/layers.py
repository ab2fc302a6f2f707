"""Functional transformer building blocks (no framework modules).

Params are plain nested dicts of jnp arrays; every function is
``f(params, x, ...) -> y`` and jit/vmap/scan-friendly. Linear weights are
stored in JAX (in, out) layout — the torch converters transpose.

Numerical conventions shared with CLIP: LayerNorm statistics in fp32 even
under bf16 activations (reference keeps fp32 LN inside its fp16 model,
maple.py:416-422), QuickGELU activation, pre-norm residual blocks.
"""

from __future__ import annotations

from typing import Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with fp32 statistics, output cast back to input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(p: dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def mlp(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["c_proj"], quick_gelu(linear(p["c_fc"], x)))


_ATTENTION_IMPL = "auto"  # "auto" | "pallas" | "xla"


def set_attention_impl(impl: str) -> None:
    """Select the attention implementation:
      * "pallas" — the fully fused (qkv-proj + softmax + out-proj) Pallas
        kernel (ops/fused_attention.py): 2x faster than the XLA lowering on
        v5e (7.25 vs 14.27 ms/layer at B=512, S=211, ViT-B), bf16 parity
        ~2e-4,
      * "xla" — the einsum formulation (CPU path, parity oracle),
      * "auto" — pallas on TPU backends, xla elsewhere (default)."""
    global _ATTENTION_IMPL
    assert impl in ("auto", "pallas", "xla"), impl
    _ATTENTION_IMPL = impl


def _use_pallas() -> bool:
    if _ATTENTION_IMPL == "auto":
        # multi-chip: pallas_call does not auto-partition under plain sharded
        # jit; "auto" keeps the XLA path when more than one device is visible.
        # Mesh-aware callers wrap their compute in shard_map (per-device
        # local shapes) and opt back in via `attention_impl("pallas")` —
        # see parallel/extract.py.
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    return _ATTENTION_IMPL == "pallas"


import contextlib


@contextlib.contextmanager
def attention_impl(impl: str):
    """Scoped attention-impl override (trace-time): used by shard_map
    callers where the Pallas kernels see per-device local shapes."""
    global _ATTENTION_IMPL
    prev = _ATTENTION_IMPL
    set_attention_impl(impl)
    try:
        yield
    finally:
        _ATTENTION_IMPL = prev


def multi_head_attention(
    p: dict,
    x: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-attention over (B, S, D) with a fused qkv projection.

    `mask` is additive, shape (S, S) (the CLIP causal text mask) or None.
    On TPU (bf16 activations) the whole operation (projections included)
    runs as one Pallas kernel; elsewhere the XLA einsum path with fp32
    softmax.
    """
    if _use_pallas() and x.dtype == jnp.bfloat16:
        from tpu_reid.ops.attention import fast_softmax_enabled
        from tpu_reid.ops.fused_attention import fused_mha, mha_block_b

        if mha_block_b(x.shape[1], x.shape[2]) is None:
            # geometry exceeds the fused kernel's VMEM budget (e.g. very
            # wide towers) — XLA path below
            pass
        else:
            return fused_mha(
                x,
                p["in_proj"]["w"].astype(x.dtype),
                p["in_proj"]["b"].astype(x.dtype),
                p["out_proj"]["w"].astype(x.dtype),
                p["out_proj"]["b"].astype(x.dtype),
                n_heads,
                mask,
                fast=fast_softmax_enabled(),
            )

    b, s, d = x.shape
    dh = d // n_heads
    qkv = linear(p["in_proj"], x)  # (B, S, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, n_heads, dh)
    k = k.reshape(b, s, n_heads, dh)
    v = v.reshape(b, s, n_heads, dh)

    from tpu_reid.ops import attention as A

    out = A.xla_mha_core(q, k, v, mask)
    return linear(p["out_proj"], out.reshape(b, s, d))


def _block_xla_impl(p: dict, x: jax.Array, n_heads: int,
                    mask: Optional[jax.Array]) -> jax.Array:
    """Pure-XLA pre-norm block body (no remat wrapper — see _block_xla)."""
    b, s, d = x.shape
    dh = d // n_heads
    h = layer_norm(p["ln_1"], x)
    qkv = linear(p["attn"]["in_proj"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    from tpu_reid.ops import attention as A

    attn = A.xla_mha_core(
        q.reshape(b, s, n_heads, dh), k.reshape(b, s, n_heads, dh),
        v.reshape(b, s, n_heads, dh), mask,
    )
    x = x + linear(p["attn"]["out_proj"], attn.reshape(b, s, d))
    return x + mlp(p["mlp"], layer_norm(p["ln_2"], x))


# Rematerialized variant for DIRECT (non-fused-path) training use:
# full-size training would otherwise hold every block's attention/MLP
# intermediates for the backward pass — ViT-B/16 at bs=64 fp32 exceeds a
# v5e's HBM. The custom-VJP backward of the fused path uses the
# UN-checkpointed _block_xla_impl instead: the custom VJP already saved
# only (p, x, mask), so under the scan backward just one block's
# intermediates are live at a time and an inner checkpoint buys no
# memory while nominally forcing a second forward recompute per block.
# Measured (v5e, chained stage-2 step, bs=64 bf16): 89.9 -> 89.7 ms — no
# wall-clock change, i.e. XLA was already CSE-ing the duplicate
# recompute subgraph; kept because it states the intended semantics
# rather than relying on CSE.
_block_xla = functools.partial(jax.checkpoint, static_argnums=(2,))(
    _block_xla_impl
)


def _apply_splice_plane(x, plane, pmask):
    """Out-of-kernel prompt splice: rows where pmask > 0 come from plane."""
    return jnp.where(pmask[None] > 0, plane[None].astype(x.dtype), x)


def _block_fused_impl(p: dict, x: jax.Array, n_heads: int,
                      mask: Optional[jax.Array],
                      plane: Optional[jax.Array] = None,
                      pmask: Optional[jax.Array] = None) -> jax.Array:
    from tpu_reid.ops.attention import fast_softmax_enabled
    from tpu_reid.ops.fused_attention import (
        block_block_b, fused_block, fused_mha, fused_mlp,
    )

    fast = fast_softmax_enabled()
    a = p["attn"]
    m = p["mlp"]
    hid = m["c_fc"]["w"].shape[-1]
    if block_block_b(x.shape[1], x.shape[2], hid) is not None:
        if plane is not None:
            return fused_block(
                x,
                p["ln_1"]["scale"], p["ln_1"]["bias"],
                a["in_proj"]["w"].astype(x.dtype),
                a["in_proj"]["b"].astype(x.dtype),
                a["out_proj"]["w"].astype(x.dtype),
                a["out_proj"]["b"].astype(x.dtype),
                p["ln_2"]["scale"], p["ln_2"]["bias"],
                m["c_fc"]["w"].astype(x.dtype),
                m["c_fc"]["b"].astype(x.dtype),
                m["c_proj"]["w"].astype(x.dtype),
                m["c_proj"]["b"].astype(x.dtype),
                n_heads,
                mask,
                prompt_plane=plane,
                prompt_mask=pmask,
                fast=fast,
            )
        # whole-block megakernel: one program, half the grid steps, and the
        # post-attention sequence never round-trips HBM (10.3 vs 12.3
        # ms/layer measured at ViT-B geometry)
        return fused_block(
            x,
            p["ln_1"]["scale"], p["ln_1"]["bias"],
            a["in_proj"]["w"].astype(x.dtype),
            a["in_proj"]["b"].astype(x.dtype),
            a["out_proj"]["w"].astype(x.dtype),
            a["out_proj"]["b"].astype(x.dtype),
            p["ln_2"]["scale"], p["ln_2"]["bias"],
            m["c_fc"]["w"].astype(x.dtype), m["c_fc"]["b"].astype(x.dtype),
            m["c_proj"]["w"].astype(x.dtype),
            m["c_proj"]["b"].astype(x.dtype),
            n_heads,
            mask,
            fast=fast,
        )
    if plane is not None:
        x = _apply_splice_plane(x, plane, pmask)
    x = fused_mha(
        x,
        a["in_proj"]["w"].astype(x.dtype),
        a["in_proj"]["b"].astype(x.dtype),
        a["out_proj"]["w"].astype(x.dtype),
        a["out_proj"]["b"].astype(x.dtype),
        n_heads,
        mask,
        ln_scale=p["ln_1"]["scale"],
        ln_bias=p["ln_1"]["bias"],
        fast=fast,
    )
    return fused_mlp(
        x, p["ln_2"]["scale"], p["ln_2"]["bias"],
        m["c_fc"]["w"].astype(x.dtype), m["c_fc"]["b"].astype(x.dtype),
        m["c_proj"]["w"].astype(x.dtype), m["c_proj"]["b"].astype(x.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _block_fused(p, x, n_heads, mask):
    return _block_fused_impl(p, x, n_heads, mask)


def _block_fused_fwd(p, x, n_heads, mask):
    # remat-style: save only (p, x, mask); the backward pass recomputes the
    # block via the XLA path and differentiates it. Pallas keeps the fast
    # forward; training carries no fused-kernel residuals in HBM.
    return _block_fused_impl(p, x, n_heads, mask), (p, x, mask)


def _block_fused_bwd(n_heads, res, g):
    p, x, mask = res
    # un-checkpointed body: one forward + one backward (see _block_xla note)
    _, vjp = jax.vjp(
        lambda p_, x_: _block_xla_impl(p_, x_, n_heads, mask), p, x
    )
    dp, dx = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dp, dx, dmask


_block_fused.defvjp(_block_fused_fwd, _block_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _block_fused_spliced(p, x, plane, pmask, n_heads, mask):
    """Fused block with the deep-prompt splice inside the kernel. Gradients
    flow to p, x AND plane (the prompt tokens train in stage 1); the
    backward pass recomputes via splice + XLA block like _block_fused."""
    return _block_fused_impl(p, x, n_heads, mask, plane, pmask)


def _block_fused_spliced_fwd(p, x, plane, pmask, n_heads, mask):
    out = _block_fused_impl(p, x, n_heads, mask, plane, pmask)
    return out, (p, x, plane, pmask, mask)


def _block_fused_spliced_bwd(n_heads, res, g):
    p, x, plane, pmask, mask = res

    def ref(p_, x_, plane_):
        xs = _apply_splice_plane(x_, plane_, pmask)
        return _block_xla_impl(p_, xs, n_heads, mask)

    _, vjp = jax.vjp(ref, p, x, plane)
    dp, dx, dplane = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dp, dx, dplane, jnp.zeros_like(pmask), dmask


_block_fused_spliced.defvjp(_block_fused_spliced_fwd, _block_fused_spliced_bwd)


def residual_block(
    p: dict,
    x: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    prompt_plane: Optional[jax.Array] = None,
    prompt_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Pre-norm transformer block: x + attn(ln1 x); x + mlp(ln2 x).

    On TPU the forward runs as exactly two Pallas programs (fused
    ln+attn+residual, fused ln+mlp+residual) — LN statistics, the softmax,
    and the 4D-wide MLP hidden tensor never round-trip HBM. Gradients flow
    through a custom VJP that recomputes via the XLA block (remat-style).

    The fused path requires bf16 activations: fp32 doubles every VMEM
    buffer and overflows the 16MB budget at the tuned block size — fp32
    callers (parity evals, fp32 training) take the XLA path. Geometries
    whose resident weights exceed the VMEM budget (fused_attention.
    fused_block_viable, e.g. ViT-L's 1024x4096 MLP) also fall back."""
    if _use_pallas() and x.dtype == jnp.bfloat16:
        from tpu_reid.ops.fused_attention import fused_block_viable

        if fused_block_viable(
            x.shape[1], x.shape[2], p["mlp"]["c_fc"]["w"].shape[-1]
        ):
            if prompt_plane is not None:
                return _block_fused_spliced(
                    p, x, prompt_plane, prompt_mask, n_heads, mask
                )
            return _block_fused(p, x, n_heads, mask)
    if prompt_plane is not None:
        x = _apply_splice_plane(x, prompt_plane, prompt_mask)
    return _block_xla(p, x, n_heads, mask)


@functools.partial(jax.checkpoint, static_argnums=(2,))
def residual_block_cls(p: dict, x: jax.Array, n_heads: int) -> jax.Array:
    """Last-block fast path for CLS-only consumers: computes the block's
    output at position 0 only, returning (B, 1, D).

    Exact, not an approximation: position 0's output depends on the rest of
    the sequence only through attention K/V, and the MLP is per-token. The
    ReID contract consumes only the CLS feature of the final block's output
    (reference: prompt_learning.py:114 takes [:, 0] of x12/xproj;
    maple.py:775-785), so running the full last block computes S-1 token
    outputs that are immediately discarded — at B=512/S=211 that is ~10 ms
    of a ~175 ms ViT-B/16 eval forward. Gradients are exact for CLS-only
    losses too, so the trainers use it as well.

    Cost is dominated by the full-sequence K/V projection (one
    (B*S, D) x (D, 2D) matmul) — a shape XLA already runs at the MXU rate,
    so no Pallas kernel is needed here.
    """
    b, s, d = x.shape
    dh = d // n_heads
    h = layer_norm(p["ln_1"], x)
    w_in = p["attn"]["in_proj"]["w"].astype(x.dtype)
    b_in = p["attn"]["in_proj"]["b"].astype(x.dtype)
    wq, wk, wv = jnp.split(w_in, 3, axis=1)
    bq, bk, bv = jnp.split(b_in, 3)
    q = jnp.dot(h[:, :1], wq) + bq                      # (B, 1, D)
    k = jnp.dot(h, wk) + bk                             # (B, S, D)
    v = jnp.dot(h, wv) + bv
    q = q.reshape(b, 1, n_heads, dh)
    k = k.reshape(b, s, n_heads, dh)
    v = v.reshape(b, s, n_heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(scores * (dh ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, 1, d)
    x0 = x[:, :1] + linear(p["attn"]["out_proj"], out)
    return x0 + mlp(p["mlp"], layer_norm(p["ln_2"], x0))


def splice_prompt_tokens(
    x: jax.Array, prompt: jax.Array, text_side: bool
) -> jax.Array:
    """Replace the prompt-token positions of a sequence with new tokens.

    The deep-prompting core (reference: maple.py:617-644):
      * vision: the prompt tokens live at the END — drop the last n_ctx
        outputs and append this layer's tokens,
      * text: the prompt tokens sit right after SOS — keep position 0,
        replace positions 1..n_ctx, keep the suffix.
    Static shapes: n_ctx comes from `prompt.shape[0]`.
    """
    n_ctx = prompt.shape[0]
    b = x.shape[0]
    tok = jnp.broadcast_to(prompt.astype(x.dtype), (b, n_ctx, x.shape[-1]))
    if text_side:
        return jnp.concatenate([x[:, :1], tok, x[:, 1 + n_ctx:]], axis=1)
    return jnp.concatenate([x[:, : x.shape[1] - n_ctx], tok], axis=1)


def transformer_stack(
    stacked: dict,
    x: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    deep_prompts: Optional[jax.Array] = None,
    prompt_flags: Optional[jax.Array] = None,
    text_side: bool = False,
) -> jax.Array:
    """Run a stack of residual blocks whose params have a leading layer axis.

    deep_prompts: (L, n_ctx, D) per-layer prompt tokens; prompt_flags: (L,)
    bool — layer i splices its tokens before the block iff flags[i]
    (reference gates with `prompts_needed > i` and i>0, maple.py:535-541).
    Implemented with lax.scan so XLA compiles one block body.

    The splice is expressed as a (S, D) plane + (S, 1) row mask and fused
    INTO the block kernel on the Pallas path — the out-of-kernel
    concat+select costs a full-sequence HBM round-trip per layer
    (~0.76 ms at ViT-B/B=512, 6.5% of the encoder).
    """

    if deep_prompts is None:
        def body(h, p):
            return residual_block(p, h, n_heads, mask), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x

    n_layers, n_ctx, dim = deep_prompts.shape
    s = x.shape[1]
    if text_side:
        row0 = 1  # keep SOS, replace positions 1..n_ctx
    else:
        row0 = s - n_ctx  # prompt tokens live at the END
    planes = jnp.zeros((n_layers, s, dim), deep_prompts.dtype)
    planes = jax.lax.dynamic_update_slice(
        planes, deep_prompts, (0, row0, 0)
    )
    row = jnp.arange(s)[:, None]
    rowmask = ((row >= row0) & (row < row0 + n_ctx)).astype(jnp.float32)

    def body(h, layer):
        p, plane, flag = layer
        h = residual_block(
            p, h, n_heads, mask,
            prompt_plane=plane,
            prompt_mask=rowmask * flag.astype(jnp.float32),
        )
        return h, None

    x, _ = jax.lax.scan(body, x, (stacked, planes, prompt_flags))
    return x


def slice_layer(stacked: dict, idx) -> dict:
    """Take one layer's params out of a stacked (leading layer axis) pytree."""
    return jax.tree.map(lambda a: a[idx], stacked)


# ---------------------------------------------------------------------------
# initializers (match CLIP's scheme, reference: coop.py:340-367)
# ---------------------------------------------------------------------------


def init_layer_norm(width: int) -> dict:
    return {"scale": jnp.ones((width,), jnp.float32),
            "bias": jnp.zeros((width,), jnp.float32)}


def init_block(key: jax.Array, width: int, layers_total: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    proj_std = (width ** -0.5) * ((2 * layers_total) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    return {
        "attn": {
            "in_proj": {
                "w": attn_std * jax.random.normal(k1, (width, 3 * width)),
                "b": jnp.zeros((3 * width,)),
            },
            "out_proj": {
                "w": proj_std * jax.random.normal(k2, (width, width)),
                "b": jnp.zeros((width,)),
            },
        },
        "ln_1": init_layer_norm(width),
        "mlp": {
            "c_fc": {
                "w": fc_std * jax.random.normal(k3, (width, 4 * width)),
                "b": jnp.zeros((4 * width,)),
            },
            "c_proj": {
                "w": proj_std * jax.random.normal(k4, (4 * width, width)),
                "b": jnp.zeros((width,)),
            },
        },
        "ln_2": init_layer_norm(width),
    }


def init_stack(key: jax.Array, layers: int, width: int) -> dict:
    keys = jax.random.split(key, layers)
    blocks = [init_block(k, width, layers) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def causal_mask(n: int) -> jax.Array:
    """CLIP's additive causal mask (reference: coop.py:369-375)."""
    return jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
