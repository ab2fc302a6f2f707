"""Stage-2 training-step timing (the chained param-fenced protocol).

Measures the flagship stage-2 step (ViT-B/16 IVLP, bs=64, bf16
activations / fp32 params) three ways on the real chip:

  * fwd        — loss forward only,
  * grad       — value_and_grad, no optimizer update,
  * step       — the production make_stage2_step (grad + optax + BN stats),
  * chained    — K full steps inside ONE jitted lax.scan carrying
                 (trainable, opt_state); the K1->K2 slope cancels the
                 per-dispatch tunnel overhead, so this is the on-chip
                 steady-state step time. This is the number VERDICT item
                 r3#7 tracks (<= 75 ms target, from 91 ms).

Run: python tools_step_time.py [--batch 64] [--k1 2 --k2 6]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from tpu_reid.models import reid_clip as M
    from tpu_reid.ops.attention import set_fast_softmax
    from tpu_reid.train import optim as O
    from tpu_reid.train import trainer as TR

    set_fast_softmax(not args.fp32)
    mcfg, params, (h, w) = _flagship()
    tcfg = TR.TrainConfig()
    adtype = jnp.float32 if args.fp32 else jnp.bfloat16

    params = jax.device_put(params)
    text_features = jax.lax.stop_gradient(
        M.all_class_text_features(params, mcfg)
    )
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(
        tcfg.lr_stage2, tcfg.weight_decay, bias_lr_mult=2.0
    )
    opt_state = optimizer.init(trainable)
    step = TR.make_stage2_step(mcfg, tcfg, optimizer)

    b = args.batch
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randn(b, h, w, 3).astype(np.float32).astype(adtype)
    )
    labels = jax.device_put(rng.randint(0, 751, (b,), np.int32))
    float(images.sum())

    def fence(*arrs):
        for a in arrs:
            float(jnp.asarray(a).ravel()[0].astype(jnp.float32))

    def timeit(fn, reps=3):
        fence(fn())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # --- forward only -----------------------------------------------------
    # the jitted fn is cached across calls (mirrors gradf below) so timed
    # reps reuse one compiled executable instead of re-tracing every call
    lossf = None

    def loss_only():
        nonlocal lossf
        if lossf is None:
            def f(tr, fr):
                p = O.combine(tr, fr)
                out = M.forward_train(p, mcfg, images, train=True)
                l = jnp.float32(0.0)
                for s in out["cls_scores"]:
                    l += s.astype(jnp.float32).mean()
                return l + out["proj"].astype(jnp.float32).mean()
            lossf = jax.jit(f)
        return lossf(trainable, frozen)

    t_fwd = timeit(loss_only)
    print(f"fwd-only        {t_fwd * 1e3:8.1f} ms")

    # --- grad, no optimizer ----------------------------------------------
    gradf = None

    def grad_only():
        nonlocal gradf
        if gradf is None:
            def f(tr, fr):
                def loss(tr_):
                    p = O.combine(tr_, fr)
                    out = M.forward_train(p, mcfg, images, train=True)
                    l = jnp.float32(0.0)
                    for s in out["cls_scores"]:
                        l += s.astype(jnp.float32).mean()
                    return l + out["proj"].astype(jnp.float32).mean()
                return jax.grad(loss)(tr)
            gradf = jax.jit(f)
        g = gradf(trainable, frozen)
        return jax.tree.leaves(g)[0]

    t_grad = timeit(grad_only)
    print(f"value_and_grad  {t_grad * 1e3:8.1f} ms  "
          f"(bwd+fwd / fwd = {t_grad / t_fwd:.2f}x)")

    # --- one full production step (dispatch incl.) ------------------------
    def full_step():
        tr, fr, os_, loss = step(
            trainable, frozen, opt_state, images, labels, text_features
        )
        return loss

    t_step = timeit(full_step)
    print(f"full step       {t_step * 1e3:8.1f} ms  (single dispatch, "
          "fenced — includes tunnel overhead)")

    # --- chained: K steps in one dispatch, slope --------------------------
    def chained(k):
        @jax.jit
        def run(tr, fr, os_):
            def body(carry, _):
                tr_, fr_, os__ = carry
                # jit-of-jit traces inline — same computation, one program
                tr_, fr_, os__, loss = step(
                    tr_, fr_, os__, images, labels, text_features
                )
                return (tr_, fr_, os__), loss
            (tr, fr, os_), losses = jax.lax.scan(
                body, (tr, fr, os_), None, length=k
            )
            return losses[-1]
        return run

    runs = {}
    for k in (args.k1, args.k2):
        r = chained(k)
        fence(r(trainable, frozen, opt_state))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fence(r(trainable, frozen, opt_state))
            ts.append(time.perf_counter() - t0)
        runs[k] = min(ts)
    ms = (runs[args.k2] - runs[args.k1]) / (args.k2 - args.k1) * 1e3
    print(f"chained slope   {ms:8.1f} ms/step  "
          f"(K={args.k1}: {runs[args.k1]*1e3:.0f} ms, "
          f"K={args.k2}: {runs[args.k2]*1e3:.0f} ms) "
          f"-> {b / (ms / 1e3):.0f} img/s")


if __name__ == "__main__":
    main()
