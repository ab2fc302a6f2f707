"""Fully fused multi-head attention: qkv projection + softmax attention +
output projection in ONE Pallas kernel.

Motivation (measured on v5e, B=512, S=211, ViT-B geometry): the standalone
Pallas softmax core beats XLA (6.97 vs 7.91 ms/layer) but loses ~6 ms/layer
to (B,S,H,dh)<->(B,H,S,dh) layout conversion and padding at the kernel
boundary. Fusing the projections into the kernel removes the boundary
entirely: activations stay (rows, D)-shaped in VMEM, heads are sliced from
the lane dimension, and the only HBM traffic is x in / out once plus the
shared weights per grid step.

Grid: one program per NB batch rows. Weights use constant index maps so
the pipeline keeps them resident across steps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# VMEM budget guard
#
# Both kernels keep their full weight matrices resident in VMEM via constant
# index maps (that is the point: weights stream in once, not per grid step),
# so a wide enough model can simply not fit. Mosaic's DEFAULT scoped-VMEM
# limit is 16 MB — far below a v5e core's physical VMEM — and raising it via
# CompilerParams(vmem_limit_bytes) is worth ~20% on both kernels at ViT-B
# geometry (measured: MLP 8.6 -> 7.0 ms, MHA 7.2 -> 5.8 ms at block_b=4,
# B=512, S=211; the extra headroom buys deeper pipelining, not bigger
# blocks — block_b=8 measured slower than 4). The element-count models
# below are calibrated against measured scoped allocations at the raised
# limit (bb=4/s=216/d=768 uses ~23 MB ~ 11M elems; bb=8 ~45 MB compiles and
# runs); callers shrink block_b by halving and fall back to the XLA path
# when even block_b=1 exceeds the budget.
# ---------------------------------------------------------------------------

_VMEM_LIMIT_BYTES = 96 * 1024 * 1024

_MHA_ELEM_BUDGET = 27_000_000
_MLP_ELEM_BUDGET = 38_000_000


def _mha_elems(bb: int, s_pad: int, d: int) -> int:
    # activations (x, qkv, per-head scores) + resident weights + mask
    return 6 * bb * s_pad * d + 4 * d * d + 2 * s_pad * s_pad


def _mlp_elems(bb: int, s_pad: int, d: int, hid: int) -> int:
    return bb * s_pad * (2 * d + 3 * hid) + 2 * d * hid


def mha_block_b(s: int, d: int, requested: int = 4) -> Optional[int]:
    """Largest batch-block <= requested whose estimated VMEM footprint fits;
    None if the geometry cannot run fused at all (fall back to XLA)."""
    s_pad = max(_round_up(s, 8), 128)
    bb = requested
    while bb >= 1:
        if _mha_elems(bb, s_pad, d) <= _MHA_ELEM_BUDGET:
            return bb
        bb //= 2
    return None


def mlp_block_b(s: int, d: int, hid: int, requested: int = 4) -> Optional[int]:
    s_pad = max(_round_up(s, 8), 128)
    bb = requested
    while bb >= 1:
        if _mlp_elems(bb, s_pad, d, hid) <= _MLP_ELEM_BUDGET:
            return bb
        bb //= 2
    return None


def fused_block_viable(s: int, d: int, hid: int) -> bool:
    """True when BOTH half-block kernels fit this geometry."""
    return mha_block_b(s, d) is not None and mlp_block_b(s, d, hid) is not None


def _block_elems(bb: int, s_pad: int, d: int, hid: int) -> int:
    # all block weights resident + mask + x/qkv/hidden/score activations
    return (
        12 * d * d + 2 * s_pad * s_pad
        + bb * s_pad * (8 * d + 2 * hid) + 2 * bb * s_pad * s_pad
    )


_BLOCK_ELEM_BUDGET = 32_000_000


def block_block_b(s: int, d: int, hid: int, requested: int = 2) -> Optional[int]:
    """Batch-block for the WHOLE-block megakernel (None -> use the
    two-kernel path). bb=2 measured fastest at ViT-B geometry: 10.3 vs
    11.5 (bb=4) / 10.7 (bb=1) / 12.3 ms per layer for the kernel pair."""
    s_pad = max(_round_up(s, 8), 128)
    bb = requested
    while bb >= 1:
        if _block_elems(bb, s_pad, d, hid) <= _BLOCK_ELEM_BUDGET:
            return bb
        bb //= 2
    return None


_LOG2E = 1.4426950408889634

# Saturation bound for the fast-softmax exp2 clamp: unnormalized probs cap
# at 2^120, so a row of s_pad <= 216 clamped scores sums to at most
# 216 * 2^120 < 2^128, i.e. within ~2^8 of fp32 max but below it — the
# row-sum denominator is overflow-free without the max-reduce for the
# short sequences these kernels serve (s_pad 128/216; a hypothetical
# s_pad > 256 would overflow at the clamp). Scores only reach the clamp
# when a logit exceeds 120/log2(e) ~ 83, where softmax is already a
# one-hot to fp32 precision. Note the guarantee covers the DENOMINATOR
# only: the unnormalized p @ v fp32 accumulation can still overflow below
# the clamp when logits approach ~83 and |v| is large across many
# elements — accepted, as that logit regime never occurs post-LayerNorm
# (observed |logits| < 30 across the CLIP towers).
_FAST_CLAMP = 120.0


def _layer_norm(x, scale, bias, eps=1e-5):
    """fp32-statistics LayerNorm over the last axis (matches models.layers)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


def _attention_heads(qkv, mask_ref, *, s_actual: int, n_heads: int,
                     has_mask: bool, fast: bool, dtype):
    """Shared per-head attention core for both fused kernels.

    One (M=S, K=dh, N=S) gemm pair per head. A pair-packed variant (two
    dh=64 heads per K=128 contraction via lane-masked keys) was built and
    measured on v5e at ViT-B geometry: 5.8-6.0 ms vs 5.8 ms for this loop
    — no win; the kernel is bound by the chip's practical MXU rate, not
    the K=64 contraction depth.

    fast=False (parity path): padded-column masking via iota compare,
    max-subtracted fp32 exp, deferred normalization.
    fast=True (throughput profile, set_fast_softmax): the caller bakes the
    column mask (and any additive mask) into mask_ref pre-scaled by
    log2(e); the kernel computes exp2(min(s, 120)) — a saturating clamp
    replaces the max-reduce+subtract (overflow-free by construction, see
    _FAST_CLAMP) and the iota/compare/select disappears.
    Both paths multiply by the row reciprocal instead of dividing the
    (S, dh) output block — one divide per row instead of dh.
    """
    nb, s_pad, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    scale = 1.0 / np.sqrt(dh)
    if fast:
        scale = scale * _LOG2E
    else:
        col = lax.broadcasted_iota(jnp.int32, (nb, s_pad, s_pad), 2)
    outs = []
    for h in range(n_heads):
        q = qkv[:, :, h * dh : (h + 1) * dh]
        k = qkv[:, :, d + h * dh : d + (h + 1) * dh]
        v = qkv[:, :, 2 * d + h * dh : 2 * d + (h + 1) * dh]
        s = lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (NB, S_pad, S_pad)
        if fast:
            s = s + mask_ref[...][None]  # baked col+user mask, log2e units
            p = jnp.exp2(jnp.minimum(s, _FAST_CLAMP))
            # without the max-subtraction a row whose unmasked logits all
            # underflow exp2 (< ~-126) — or a fully user-masked row — sums
            # to 0; floor the denominator so the output degrades to 0
            # instead of inf/NaN (one extra VPU op per row)
            denom = jnp.maximum(
                jnp.sum(p, axis=-1, keepdims=True), 1e-30
            )
        else:
            s = jnp.where(col < s_actual, s, -1e30)
            if has_mask:
                s = s + mask_ref[...][None]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
        # deferred normalization: scale the (S, dh) output by the row-sum
        # reciprocal instead of dividing the (S, S) probabilities —
        # measured 5.69 -> 5.53 ms/layer at B=512 ViT-B.
        recip = 1.0 / denom
        o = lax.dot_general(
            p.astype(dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        outs.append((o * recip).astype(dtype))
    return jnp.concatenate(outs, axis=-1)  # (NB, S_pad, D)


def _kernel(x_ref, ln_s_ref, ln_b_ref, win_ref, bin_ref, wout_ref, bout_ref,
            mask_ref, o_ref, *, s_actual: int, n_heads: int, has_mask: bool,
            pre_ln: bool, residual: bool, fast: bool):
    x_in = x_ref[...]  # (NB, S_pad, D)
    x = _layer_norm(x_in, ln_s_ref[...], ln_b_ref[...]) if pre_ln else x_in
    qkv = lax.dot_general(
        x, win_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bin_ref[...][None]).astype(x.dtype)  # (NB, S_pad, 3D)
    attn = _attention_heads(
        qkv, mask_ref, s_actual=s_actual, n_heads=n_heads,
        has_mask=has_mask, fast=fast, dtype=x.dtype,
    )
    proj = lax.dot_general(
        attn, wout_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    proj = proj + bout_ref[...][None]
    if residual:
        proj = proj + x_in.astype(jnp.float32)
    o_ref[...] = proj.astype(o_ref.dtype)


def _bake_fast_mask(mask: Optional[jax.Array], s: int,
                    s_pad: int) -> jax.Array:
    """Fast-softmax mask: padded-column -1e30 plus any additive mask, all
    pre-scaled by log2(e) so the kernel's exp2 consumes it directly."""
    base = jnp.where(jnp.arange(s_pad) < s, 0.0, -1e30)
    m = jnp.broadcast_to(base[None, :], (s_pad, s_pad))
    if mask is not None:
        m = m + jnp.pad(
            jnp.maximum(mask.astype(jnp.float32), -1e30),
            [(0, s_pad - s), (0, s_pad - s)],
        )
    return (m * _LOG2E).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "block_b", "interpret", "fast"),
)
def fused_mha(
    x: jax.Array,  # (B, S, D)
    w_in: jax.Array,  # (D, 3D)
    b_in: jax.Array,  # (3D,)
    w_out: jax.Array,  # (D, D)
    b_out: jax.Array,  # (D,)
    n_heads: int,
    mask: Optional[jax.Array] = None,
    ln_scale: Optional[jax.Array] = None,  # (D,) -> fuse pre-LN + residual
    ln_bias: Optional[jax.Array] = None,
    block_b: Optional[int] = None,
    interpret: bool = False,
    fast: bool = False,
) -> jax.Array:
    """Fused attention. With ln_scale/ln_bias the kernel computes the whole
    pre-norm half-block x + attn(ln(x)); without them, just attn(x).
    block_b=None picks the largest batch-block the VMEM budget allows."""
    b, s, d = x.shape
    if block_b is None:
        block_b = mha_block_b(s, d)
        if block_b is None:
            raise ValueError(
                f"fused_mha: geometry (s={s}, d={d}) exceeds the VMEM "
                "budget even at block_b=1 — use the XLA attention path"
            )
    s_pad = max(_round_up(s, 8), 128)
    b_pad = _round_up(b, block_b)
    xp = jnp.pad(x, [(0, b_pad - b), (0, s_pad - s), (0, 0)])
    has_mask = mask is not None
    pre_ln = ln_scale is not None
    if fast:
        maskp = _bake_fast_mask(mask, s, s_pad)
    else:
        maskp = (
            jnp.pad(jnp.maximum(mask.astype(jnp.float32), -1e30),
                    [(0, s_pad - s), (0, s_pad - s)])
            if has_mask else jnp.zeros((s_pad, s_pad), jnp.float32)
        )
    mask_shape = (s_pad, s_pad)
    if not pre_ln:
        ln_scale = jnp.ones((d,), x.dtype)
        ln_bias = jnp.zeros((d,), x.dtype)
    grid = (b_pad // block_b,)
    row = lambda arr: arr.reshape(1, -1)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(
            _kernel, s_actual=s, n_heads=n_heads, has_mask=has_mask,
            pre_ln=pre_ln, residual=pre_ln, fast=fast,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(mask_shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * s_pad * d * (4 * d + 2 * s_pad),
            bytes_accessed=2 * b_pad * s_pad * d * x.dtype.itemsize
            + 4 * d * d * x.dtype.itemsize,
            transcendentals=b_pad * n_heads * s_pad * s_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(xp, row(ln_scale.astype(x.dtype)), row(ln_bias.astype(x.dtype)),
      w_in, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1), maskp)
    return out[:b, :s]


# ---------------------------------------------------------------------------
# fused LN + MLP + residual (the other half-block)
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref, wpj_ref,
                bpj_ref, o_ref):
    x_in = x_ref[...]  # (NB, S_pad, D)
    x = _layer_norm(x_in, ln_s_ref[...], ln_b_ref[...])
    h = lax.dot_general(
        x, wfc_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[...][None]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU in fp32
    y = lax.dot_general(
        h.astype(x.dtype), wpj_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bpj_ref[...][None]
    o_ref[...] = (y + x_in.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_mlp(
    x: jax.Array,  # (B, S, D)
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w_fc: jax.Array,  # (D, 4D)
    b_fc: jax.Array,
    w_proj: jax.Array,  # (4D, D)
    b_proj: jax.Array,
    block_b: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """x + mlp(ln(x)) — the hidden (NB, S, 4D) tensor never leaves VMEM.
    block_b=None picks the largest batch-block the VMEM budget allows."""
    b, s, d = x.shape
    hid = w_fc.shape[1]
    if block_b is None:
        block_b = mlp_block_b(s, d, hid)
        if block_b is None:
            raise ValueError(
                f"fused_mlp: geometry (s={s}, d={d}, hid={hid}) exceeds the "
                "VMEM budget even at block_b=1 — use the XLA MLP path"
            )
    s_pad = max(_round_up(s, 8), 128)
    b_pad = _round_up(b, block_b)
    xp = jnp.pad(x, [(0, b_pad - b), (0, s_pad - s), (0, 0)])
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * s_pad * d * hid,
            bytes_accessed=2 * b_pad * s_pad * d * x.dtype.itemsize
            + 2 * d * hid * x.dtype.itemsize,
            transcendentals=b_pad * s_pad * hid,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(xp, ln_scale.astype(x.dtype).reshape(1, -1),
      ln_bias.astype(x.dtype).reshape(1, -1),
      w_fc, b_fc.reshape(1, -1), w_proj, b_proj.reshape(1, -1))
    return out[:b, :s]


# ---------------------------------------------------------------------------
# whole-block megakernel: ln1 + attention + residual + ln2 + mlp + residual
# in ONE pallas program — the post-attention sequence never touches HBM and
# the grid runs half as many steps as the two-kernel pair. Measured (v5e,
# B=512, S=211, ViT-B, 12 chained layers in one jit): 10.3 ms/layer at
# block_b=2 vs 12.3 ms/layer for the fused_mha+fused_mlp pair.
# ---------------------------------------------------------------------------


def _whole_block_kernel(
    x_ref, l1s_ref, l1b_ref, win_ref, bin_ref, wout_ref, bout_ref,
    l2s_ref, l2b_ref, wfc_ref, bfc_ref, wpj_ref, bpj_ref, mask_ref,
    plane_ref, pmask_ref, o_ref,
    *, s_actual: int, n_heads: int, has_mask: bool, has_prompt: bool,
    fast: bool,
):
    x_in = x_ref[...]  # (NB, S_pad, D)
    if has_prompt:
        # deep-prompt splice fused into the block: replace the prompt-token
        # rows with this layer's tokens entirely in VMEM (the out-of-kernel
        # concat+select costs ~0.76 ms/layer of HBM traffic at ViT-B
        # geometry, reference semantics: maple.py:617-644)
        x_in = jnp.where(pmask_ref[...][None] > 0, plane_ref[...][None],
                         x_in)
    x = _layer_norm(x_in, l1s_ref[...], l1b_ref[...])
    qkv = lax.dot_general(
        x, win_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bin_ref[...][None]).astype(x.dtype)
    attn = _attention_heads(
        qkv, mask_ref, s_actual=s_actual, n_heads=n_heads,
        has_mask=has_mask, fast=fast, dtype=x.dtype,
    )
    proj = lax.dot_general(
        attn, wout_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    x1 = (proj + bout_ref[...][None] + x_in.astype(jnp.float32)).astype(
        x_in.dtype
    )

    h2 = _layer_norm(x1, l2s_ref[...], l2b_ref[...])
    hid = lax.dot_general(
        h2, wfc_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[...][None]
    # QuickGELU in fp32 (bf16 variant measured slower on v5e)
    hid = hid * jax.nn.sigmoid(1.702 * hid)
    y = lax.dot_general(
        hid.astype(x.dtype), wpj_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (y + bpj_ref[...][None] + x1.astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("n_heads", "block_b", "interpret", "fast")
)
def fused_block(
    x: jax.Array,  # (B, S, D)
    ln1_scale: jax.Array,
    ln1_bias: jax.Array,
    w_in: jax.Array,   # (D, 3D)
    b_in: jax.Array,
    w_out: jax.Array,  # (D, D)
    b_out: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
    w_fc: jax.Array,   # (D, hid)
    b_fc: jax.Array,
    w_proj: jax.Array,  # (hid, D)
    b_proj: jax.Array,
    n_heads: int,
    mask: Optional[jax.Array] = None,
    block_b: Optional[int] = None,
    interpret: bool = False,
    prompt_plane: Optional[jax.Array] = None,  # (S, D) rows to splice in
    prompt_mask: Optional[jax.Array] = None,   # (S, 1) >0 where to splice
    fast: bool = False,
) -> jax.Array:
    """One pre-norm transformer block as a single Pallas program.

    prompt_plane/prompt_mask: optional fused deep-prompt splice — rows of
    x where prompt_mask > 0 are replaced by prompt_plane BEFORE the block
    (IVLP/MaPLe per-layer token replacement, reference maple.py:617-644),
    without the separate HBM round-trip an out-of-kernel select costs."""
    b, s, d = x.shape
    hid = w_fc.shape[1]
    if block_b is None:
        block_b = block_block_b(s, d, hid)
        if block_b is None:
            raise ValueError(
                f"fused_block: geometry (s={s}, d={d}, hid={hid}) exceeds "
                "the VMEM budget even at block_b=1 — use the two-kernel or "
                "XLA path"
            )
    s_pad = max(_round_up(s, 8), 128)
    b_pad = _round_up(b, block_b)
    xp = jnp.pad(x, [(0, b_pad - b), (0, s_pad - s), (0, 0)])
    has_mask = mask is not None
    if fast:
        maskp = _bake_fast_mask(mask, s, s_pad)
    else:
        maskp = (
            jnp.maximum(
                jnp.pad(mask.astype(jnp.float32),
                        [(0, s_pad - s), (0, s_pad - s)]),
                -1e30,
            )
            if has_mask else jnp.zeros((s_pad, s_pad), jnp.float32)
        )
    has_prompt = prompt_plane is not None
    if has_prompt:
        planep = jnp.pad(
            prompt_plane.astype(x.dtype), [(0, s_pad - s), (0, 0)]
        )
        pmaskp = jnp.pad(
            prompt_mask.astype(jnp.float32), [(0, s_pad - s), (0, 0)]
        )
    else:
        planep = jnp.zeros((s_pad, d), x.dtype)
        pmaskp = jnp.zeros((s_pad, 1), jnp.float32)
    const = lambda i: (0, 0)
    row = lambda n: pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _whole_block_kernel, s_actual=s, n_heads=n_heads,
            has_mask=has_mask, has_prompt=has_prompt, fast=fast,
        ),
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(d), row(d),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            row(3 * d),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            row(d),
            row(d), row(d),
            pl.BlockSpec((d, hid), const, memory_space=pltpu.VMEM),
            row(hid),
            pl.BlockSpec((hid, d), const, memory_space=pltpu.VMEM),
            row(d),
            pl.BlockSpec((s_pad, s_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, s_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, s_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            # qkv/out/mlp gemms (4d^2 + 2d*hid MACs/token) + attention core
            flops=2 * b_pad * s_pad * (4 * d * d + 2 * d * hid)
            + 4 * b_pad * s_pad * s_pad * d,
            bytes_accessed=2 * b_pad * s_pad * d * x.dtype.itemsize
            + (4 * d * d + 2 * d * hid) * x.dtype.itemsize,
            transcendentals=b_pad * s_pad * (n_heads * s_pad + hid),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp,
      ln1_scale.astype(x.dtype).reshape(1, -1),
      ln1_bias.astype(x.dtype).reshape(1, -1),
      w_in, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1),
      ln2_scale.astype(x.dtype).reshape(1, -1),
      ln2_bias.astype(x.dtype).reshape(1, -1),
      w_fc, b_fc.reshape(1, -1), w_proj, b_proj.reshape(1, -1),
      maskp, planep, pmaskp)
    return out[:b, :s]
