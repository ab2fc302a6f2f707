"""Per-component on-chip timing of the bench extraction path (slope method).

Each component is timed as a lax.scan over K iterations with a
data-dependent carry (the next input is perturbed by the previous output)
so XLA cannot hoist the compute. Per-iteration time = (t(K2) - t(K1)) /
(K2 - K1), median over repeats.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship
from tpu_reid.models import reid_clip as M
from tpu_reid.models import vit as V
from tpu_reid.models import layers as L
from tpu_reid.ops.attention import set_fast_softmax

set_fast_softmax(True)  # match bench.py's throughput profile
mcfg, params, (h, w) = _flagship()
vcfg = mcfg.clip.vision


@jax.jit
def to_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree,
    )


params = to_bf16(params)
visual = params["clip"]["visual"]
B = 512
S = vcfg.h_grid * vcfg.w_grid + 1
D = vcfg.width
print(f"S={S} D={D} grid={vcfg.h_grid}x{vcfg.w_grid}")

key = jax.random.key(0)
img = jax.random.normal(key, (B, h, w, 3), jnp.bfloat16)
seq = jax.random.normal(key, (B, S, D), jnp.bfloat16)


def timed(fn, x0, k1=1, k2=4, reps=2):
    def scan_k(k):
        @jax.jit
        def run(x):
            def body(c, _):
                y = fn(c)
                # data-dependent: perturb the carry so nothing hoists
                c2 = c + (jnp.real(jnp.mean(y)) * 1e-12).astype(c.dtype)
                return c2, None
            c, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.mean(c)
        return run

    r1, r2 = scan_k(k1), scan_k(k2)
    float(r1(x0)); float(r2(x0))  # compile+warm
    t1s, t2s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r1(x0)); t1s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r2(x0)); t2s.append(time.perf_counter() - t)
    ms = (np.median(t2s) - np.median(t1s)) / (k2 - k1) * 1e3
    return ms


def f_patch(x):
    return V.patch_embed(visual, vcfg, x)


def f_pre(x):
    t = V.patch_embed(visual, vcfg, x)
    b = t.shape[0]
    cls = jnp.broadcast_to(visual["class_embedding"].astype(t.dtype), (b, 1, D))
    t = jnp.concatenate([cls, t], axis=1)
    t = t + visual["positional_embedding"].astype(t.dtype)
    return L.layer_norm(visual["ln_pre"], t)


head = L.slice_layer(visual["blocks"], slice(0, vcfg.layers - 1))
tail_blk = L.slice_layer(visual["blocks"], vcfg.layers - 1)


def f_stack(x):
    return L.transformer_stack(head, x, vcfg.heads, text_side=False)


def f_tail(x):
    x12 = L.residual_block_cls(tail_blk, x, vcfg.heads)
    x12 = L.layer_norm(visual["ln_post"], x12)
    xp = jnp.dot(x12, visual["proj"].astype(x12.dtype))
    out = jnp.concatenate([x12[:, 0], xp[:, 0]], axis=-1)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def f_full(x):
    return M.eval_embed(params, mcfg, x)


import sys
cases = {
    "patch": ("patch_embed", f_patch, img),
    "pre": ("patch+pre(ln_pre)", f_pre, img),
    "stack": ("11-block stack", f_stack, seq),
    "tail": ("cls-block+tail", f_tail, seq),
    "full": ("full eval_embed", f_full, img),
}
name, fn, x0 = cases[sys.argv[1]]
ms = timed(fn, x0)
print(f"{name:22s} {ms:7.2f} ms/batch")
