"""Probe: on-chip ms/batch via the K->2K lax.scan slope (cancels all
per-dispatch tunnel overhead). Methodology from docs/ROADMAP.md."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models import reid_clip as M
    from tpu_reid.ops.attention import set_fast_softmax

    from __graft_entry__ import _flagship

    set_fast_softmax(True)
    mcfg, params, (h, w) = _flagship()

    @jax.jit
    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tree,
        )

    params = to_bf16(params)
    pp = DevicePreprocess((h, w), "vit", dtype=jnp.bfloat16)

    batch = 512
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.randint(0, 255, (batch, h, w, 3), np.uint8))
    float(images.sum())

    def run_k(k):
        @jax.jit
        def body(p, im):
            def step(carry, _):
                # make the RAW input carry-dependent so neither the
                # preprocess nor the encoder can be hoisted out of the
                # loop (advisor finding r2); the select is never taken
                # (carry stays finite/small) so values are unperturbed
                im_k = jnp.where(carry > 1e30, im ^ jnp.uint8(1), im)
                x = pp.eval_batch(im_k)
                f = M.eval_embed(p, mcfg, x)
                return carry + f[0, 0].astype(jnp.float32), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=k)
            return out

        float(body(params, images))  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(body(params, images))
            times.append(time.perf_counter() - t0)
        return min(times)

    t4 = run_k(4)
    t8 = run_k(8)
    ms = (t8 - t4) / 4 * 1e3
    if ms <= 0:
        print(f"K=4: {t4*1e3:.1f} ms  K=8: {t8*1e3:.1f} ms — noisy "
              "measurement (non-positive slope), rerun")
        return
    print(f"K=4: {t4*1e3:.1f} ms  K=8: {t8*1e3:.1f} ms  "
          f"slope {ms:.1f} ms/batch -> {batch/ (ms/1e3):.0f} emb/s on-chip")


if __name__ == "__main__":
    main()
