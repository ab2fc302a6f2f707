"""Pallas fused attention for the CLIP towers.

The encoder's sequences are short (211 vision tokens at 256x128/stride-12,
77 text tokens), so the entire (S, S) score matrix for one (batch, head)
pair fits comfortably in VMEM. XLA's generic attention lowering spends
~60% of its time on transposes and fp32 softmax round-trips to HBM
(profiled at 14.4 ms/block vs 8.6 ms for the larger-FLOP MLP); this kernel
fuses score computation, masking, softmax, and the weighted sum into one
VMEM-resident program per (batch, head).

Layout: q, k, v arrive as (B, S, H, dh) — the natural reshape of the fused
qkv projection, no transposes — and the output leaves in the same layout.
S is padded to a multiple of 128 (MXU tile); padded key columns are masked
with -1e30 before the softmax, padded query rows are sliced off outside.

Falls back to the XLA formulation on non-TPU backends (CPU tests) and for
shapes where padding would dominate.
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


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, s_actual: int,
                 scale: float, has_mask: bool):
    q = q_ref[0]  # (H, S_pad, dh)
    k = k_ref[0]
    v = v_ref[0]
    s = lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (H, S_pad, S_pad)
    h, s_pad, _ = s.shape
    col = lax.broadcasted_iota(jnp.int32, (h, s_pad, s_pad), 2)
    s = jnp.where(col < s_actual, s, -1e30)
    if has_mask:
        s = s + mask_ref[...][None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # deferred normalization: divide the (S, dh) output instead of the
    # (S, S) probabilities — same math, 3.4x fewer fp32 divisions
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_core(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Softmax attention core: (B, S, H, dh) x3 -> (B, S, H, dh).

    mask: optional additive (S, S) fp32 mask (the CLIP causal text mask)."""
    b, s, h, dh = q.shape
    # pad S to the VPU sublane multiple (8), not the MXU lane multiple:
    # the exp + score traffic scales with s_pad^2 and dominates, and the
    # MXU pads its own tiles internally (measured: 216 beats 256 by 20%)
    s_pad = max(_round_up(s, 8), 128)
    scale = 1.0 / np.sqrt(dh)
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    # (B, S, H, dh) -> (B, H, S_pad, dh): the kernel tiles the last two dims
    qp, kp, vp = (
        jnp.pad(t.transpose(0, 2, 1, 3), pad) for t in (q, k, v)
    )
    has_mask = mask is not None
    if has_mask:
        maskp = jnp.pad(
            mask.astype(jnp.float32),
            [(0, s_pad - s), (0, s_pad - s)],
        )
        # -inf entries turn into NaN inside exp(s - m) when a whole padded
        # row is -inf; clamp to a large negative finite value instead
        maskp = jnp.maximum(maskp, -1e30)
    else:
        maskp = jnp.zeros((s_pad, s_pad), jnp.float32)

    spec = pl.BlockSpec(
        (1, h, s_pad, dh), lambda bi: (bi, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (s_pad, s_pad), lambda bi: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, s_actual=s, scale=scale, has_mask=has_mask
        ),
        grid=(b,),
        in_specs=[spec, spec, spec, mask_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s_pad * s_pad * dh,
            bytes_accessed=4 * b * s_pad * h * dh * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :, :s].transpose(0, 2, 1, 3)


_FAST_SOFTMAX = False


def set_fast_softmax(enabled: bool) -> None:
    """Throughput profile for the attention softmax. Per-path behavior:

    * XLA core (`xla_mha_core`, bf16 inputs only): probabilities cast to
      bf16 after a standard fp32 max-subtracted exp; the normalizing sum
      stays fp32.
    * Pallas fused kernels (`fused_attention.fused_mha/fused_block` with
      fast=True): a DIFFERENT approximation — exp2 with a saturating
      clamp replaces the max-reduce+subtract entirely (masks are baked
      pre-scaled by log2(e)); probabilities are cast to the input dtype
      for the p@v gemm, as in the parity path.
    * The custom-VJP remat backward (`models.layers` _block_xla via
      xla_mha_core) differentiates the XLA bf16-prob variant, so under
      training the fused forward (exp2/clamp) and recompute backward
      (bf16 probs) use different approximations of the same softmax —
      both within ~3e-2 of exact pre-normalization, but not bit-equal
      to each other.

    ~10% end-to-end encoder speedup; embedding deltas ~3e-2 absolute
    pre-normalization (measured mAP delta at Market-1501 scale is
    recorded in BASELINE.md). Parity-sensitive evals should leave this
    off (default). Production surface: `--fast_softmax` on the CLIs."""
    global _FAST_SOFTMAX
    _FAST_SOFTMAX = enabled


def fast_softmax_enabled() -> bool:
    """Trace-time read of the fast-softmax profile flag (the fused Pallas
    kernels switch to the exp2/saturating-clamp softmax when set)."""
    return _FAST_SOFTMAX


def xla_mha_core(q, k, v, mask=None):
    """XLA attention core (default; also the CPU path and parity oracle)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    if _FAST_SOFTMAX and q.dtype == jnp.bfloat16:
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(jnp.bfloat16)
        p = e / jnp.sum(e, axis=-1, keepdims=True,
                        dtype=jnp.float32).astype(jnp.bfloat16)
    else:
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def attention_core(q, k, v, mask=None):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return mha_core(q, k, v, mask)
    return xla_mha_core(q, k, v, mask)
