"""Backward-strategy probe (r5, VERDICT r4 ask #3).

Grad of the encoder-only scalar at bs=64 bf16 under three block
strategies plus the optimizer, chained K-slope:
  A. shipped: Pallas fused fwd + custom-VJP XLA-recompute bwd
  B. XLA block, NO remat: autodiff saves intermediates (memory-for-time)
  C. XLA block, jax.checkpoint (the classic remat both ways)
  D. grad + Adam chained (isolates the optimizer cost)

Measured r5 (v5e, axon tunnel): A 69.5 / B 83.0 / C 73.9 / D 88.2 ms —
the shipped strategy wins; the memory-for-time trade loses; the Adam
chain adds ~19 ms (see BASELINE.md strategy-probe ledger and the
flat-Adam dead end in optim.py).
"""
import sys, time
import numpy as np


import jax, jax.numpy as jnp

from __graft_entry__ import _flagship
from tpu_reid.models import reid_clip as M
from tpu_reid.models import layers as L
from tpu_reid.ops.attention import set_fast_softmax
from tpu_reid.train import optim as O

set_fast_softmax(True)
mcfg, params, (h, w) = _flagship()
params = jax.device_put(params)
b = 64
rng = np.random.RandomState(0)
images = jax.device_put(
    rng.randn(b, h, w, 3).astype(np.float32).astype(jnp.bfloat16)
)
trainable, frozen = O.partition(params, lambda p: M.stage2_trainable(p, mcfg))
float(images.sum())


def slope(make_run, k1=2, k2=6, reps=3):
    r1, r2 = make_run(k1), make_run(k2)
    def fence(x):
        float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    fence(r1()); fence(r2())
    ts1, ts2 = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fence(r1()); ts1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); fence(r2()); ts2.append(time.perf_counter()-t0)
    return (min(ts2) - min(ts1)) / (k2 - k1) * 1e3


def chain(fn, tr, fr, im):
    def make(k):
        @jax.jit
        def run(tr, fr, im):
            def body(im_c, _):
                out = fn(tr, fr, im_c)
                eps = jnp.asarray(out, jnp.float32).ravel()[0] * 1e-38
                return im_c + eps.astype(im_c.dtype), out.ravel()[0]
            _, outs = jax.lax.scan(body, im, None, length=k)
            return outs
        return lambda: run(tr, fr, im)
    return make


def grad_fn(tr, fr, im):
    def loss(tr_):
        p = O.combine(tr_, fr)
        return M.encode_image_features(p, mcfg, im)["proj"].astype(
            jnp.float32
        ).mean()
    return jax.tree.leaves(jax.grad(loss)(tr))[0]


import contextlib


@contextlib.contextmanager
def xla_blocks(remat: bool):
    """Force the XLA block path; optionally strip the checkpoint wrapper."""
    orig_rb = L.residual_block
    orig_cp = L._block_xla

    def rb(p, x, n_heads, mask=None, prompt_plane=None, prompt_mask=None):
        if prompt_plane is not None:
            x = L._apply_splice_plane(x, prompt_plane, prompt_mask)
        if remat:
            return orig_cp(p, x, n_heads, mask)
        return L._block_xla_impl(p, x, n_heads, mask)

    L.residual_block = rb
    try:
        yield
    finally:
        L.residual_block = orig_rb


print(f"A pallas+customvjp  {slope(chain(grad_fn, trainable, frozen, images)):7.1f} ms", flush=True)
with xla_blocks(remat=False):
    print(f"B xla no-remat      {slope(chain(grad_fn, trainable, frozen, images)):7.1f} ms", flush=True)
with xla_blocks(remat=True):
    print(f"C xla remat         {slope(chain(grad_fn, trainable, frozen, images)):7.1f} ms", flush=True)


# D: grad + optimizer update chained (isolates the optimizer's true cost —
# the carry threads (tr, opt_state) like the production step)
import optax
from tpu_reid.train import optim as OPT

optimizer = OPT.make_stage_optimizer(5e-6, 1e-4, bias_lr_mult=2.0)
opt_state = optimizer.init(trainable)


def chain_opt(k):
    @jax.jit
    def run(tr, os_, fr, im):
        def body(carry, _):
            tr_, os__ = carry
            def loss(t):
                p = O.combine(t, fr)
                return M.encode_image_features(p, mcfg, im)["proj"].astype(
                    jnp.float32
                ).mean()
            g = jax.grad(loss)(tr_)
            upd, os__ = optimizer.update(g, os__, tr_)
            tr_ = optax.apply_updates(tr_, upd)
            return (tr_, os__), jnp.float32(0)
        (tr, os_), _ = jax.lax.scan(body, (tr, os_), None, length=k)
        return jax.tree.leaves(tr)[0]
    return lambda: run(trainable, opt_state, frozen, images)


print(f"D grad+adam chained {slope(chain_opt):7.1f} ms", flush=True)
