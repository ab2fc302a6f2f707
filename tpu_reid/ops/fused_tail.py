"""Fused CLS tail: ln_post + projection in one Pallas program.

The ReID eval contract consumes the final block's CLS row twice —
LayerNormed (x12) and projected (x12 @ proj) (reference: maple.py:780-783,
prompt_learning.py:114). As separate XLA ops the (B, D) CLS tensor
round-trips HBM between the LN and the gemm; this kernel computes both
outputs from one VMEM-resident load. Identified as the last named
sub-ms headroom in docs/ROADMAP.md (r2) — the measured bench delta is
recorded there either way.

Backward follows the models.layers._block_fused pattern: custom VJP that
recomputes the (cheap) tail via XLA and differentiates that — the fused
kernel stays forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tail_kernel(x_ref, ls_ref, lb_ref, proj_ref, y_ref, p_ref, *,
                 eps: float):
    x32 = x_ref[...].astype(jnp.float32)  # (NB, D)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    y = y.astype(y_ref.dtype)
    y_ref[...] = y
    p_ref[...] = lax.dot_general(
        y, proj_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(p_ref.dtype)


def _tail_xla(x, ln_scale, ln_bias, proj, eps=1e-5):
    """XLA reference/backward implementation (fp32 LN stats, like
    models.layers.layer_norm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    return y, jnp.dot(y, proj.astype(y.dtype))


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _tail_pallas(x, ln_scale, ln_bias, proj, block_b=256, interpret=False):
    b, d = x.shape
    e = proj.shape[1]
    block_b = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, block_b)
    xp = jnp.pad(x, [(0, b_pad - b), (0, 0)])
    const = lambda i: (0, 0)
    y, p = pl.pallas_call(
        functools.partial(_tail_kernel, eps=1e-5),
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, e), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d), x.dtype),
            jax.ShapeDtypeStruct((b_pad, e), x.dtype),
        ],
        interpret=interpret,
    )(xp, ln_scale.astype(x.dtype).reshape(1, -1),
      ln_bias.astype(x.dtype).reshape(1, -1), proj.astype(x.dtype))
    return y[:b], p[:b]


def _interpret() -> bool:
    # interpret mode off the TPU backend so the custom-VJP path is
    # exercisable (and testable) on CPU
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def _tail_fused(x, ln_scale, ln_bias, proj):
    return _tail_pallas(x, ln_scale, ln_bias, proj, interpret=_interpret())


def _tail_fused_fwd(x, ln_scale, ln_bias, proj):
    return (
        _tail_pallas(x, ln_scale, ln_bias, proj, interpret=_interpret()),
        (x, ln_scale, ln_bias, proj),
    )


def _tail_fused_bwd(res, g):
    x, ln_scale, ln_bias, proj = res
    _, vjp = jax.vjp(_tail_xla, x, ln_scale, ln_bias, proj)
    return vjp(g)


_tail_fused.defvjp(_tail_fused_fwd, _tail_fused_bwd)


def ln_proj_tail(x, ln_params, proj):
    """(B, D) CLS rows -> (ln(x), ln(x) @ proj).

    Pallas-fused on single-device TPU bf16 (one HBM read of x, both
    outputs from VMEM); XLA elsewhere — exactly the layers.layer_norm +
    dot composition, so the switch is parity-invisible."""
    from tpu_reid.models.layers import _use_pallas

    if _use_pallas() and x.dtype == jnp.bfloat16 and x.ndim == 2:
        return _tail_fused(x, ln_params["scale"], ln_params["bias"], proj)
    return _tail_xla(x, ln_params["scale"], ln_params["bias"], proj)
