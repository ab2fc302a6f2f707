"""Component-level timing of the stage-2 step at bs=64 bf16 (chained
K-slope; args passed explicitly so they stay program parameters, and each
scan iteration carries a data dependency so XLA cannot hoist the body).

Measured r5: encode fwd 15.9 / forward_train 16.0 / encoder grad 69.5 /
full-loss grad 69.3 ms (BASELINE.md "step decomposition").
"""
import time
import numpy as np
import jax, jax.numpy as jnp
import sys


from __graft_entry__ import _flagship
from tpu_reid.models import reid_clip as M
from tpu_reid.ops.attention import set_fast_softmax
from tpu_reid.train import optim as O

set_fast_softmax(True)
mcfg, params, (h, w) = _flagship()
params = jax.device_put(params)
b = 64
rng = np.random.RandomState(0)
images = jax.device_put(rng.randn(b, h, w, 3).astype(np.float32).astype(jnp.bfloat16))
labels = jax.device_put(rng.randint(0, 751, (b,), np.int32))
text_features = jax.lax.stop_gradient(M.all_class_text_features(params, mcfg))
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

def chain(fn, tr, fr, im, *rest):
    """fn(tr, fr, im, *rest) chained K times inside one jit. Args are
    explicit (program parameters, not baked HLO constants) and each
    iteration's image input carries a data dependency on the previous
    output (an exactly-zero bf16 epsilon) so XLA cannot hoist the
    loop-invariant body out of the scan."""
    def make(k):
        @jax.jit
        def run(tr, fr, im, *rest):
            def body(im_c, _):
                out = fn(tr, fr, im_c, *rest)
                eps = jnp.asarray(out, jnp.float32).ravel()[0] * 1e-38
                return im_c + eps.astype(im_c.dtype), out.ravel()[0]
            _, outs = jax.lax.scan(body, im, None, length=k)
            return outs
        return lambda: run(tr, fr, im, *rest)
    return make

# 1. image encode only
def enc(tr, fr, im):
    p = O.combine(tr, fr)
    return M.encode_image_features(p, mcfg, im)["proj"]
print(f"encode_image fwd      {slope(chain(enc, trainable, frozen, images)):7.1f} ms", flush=True)

# 2. forward_train (adds BNNecks + 751-way heads)
def ft(tr, fr, im):
    p = O.combine(tr, fr)
    return M.forward_train(p, mcfg, im, train=True)["proj"]
print(f"forward_train fwd     {slope(chain(ft, trainable, frozen, images)):7.1f} ms", flush=True)

# 3. grad of encoder-only scalar
def ge(tr, fr, im):
    def loss(tr_):
        p = O.combine(tr_, fr)
        return M.encode_image_features(p, mcfg, im)["proj"].astype(jnp.float32).mean()
    return jax.tree.leaves(jax.grad(loss)(tr))[0]
print(f"encode_image grad     {slope(chain(ge, trainable, frozen, images)):7.1f} ms", flush=True)

# 4. grad of full stage-2 loss
from tpu_reid.train import losses as LS
def gf(tr, fr, im, lab, txt):
    def loss(tr_):
        p = O.combine(tr_, fr)
        out = M.forward_train(p, mcfg, im, train=True)
        l = jnp.float32(0.0)
        for s in out["cls_scores"]:
            l += 0.25 * LS.cross_entropy_label_smooth(s, lab)
        img = out["proj"] / jnp.linalg.norm(out["proj"], axis=-1, keepdims=True)
        t = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        l += LS.cross_entropy_label_smooth((img @ t.T) / 0.07, lab)
        for f in out["features"]:
            l += LS.triplet_loss(f.astype(jnp.float32), lab)
        return l
    return jax.tree.leaves(jax.grad(loss)(tr))[0]
print(f"full loss grad        {slope(chain(gf, trainable, frozen, images, labels, text_features)):7.1f} ms", flush=True)
