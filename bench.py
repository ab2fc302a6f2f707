"""Benchmark: gallery embeddings/sec/chip on the flagship encoder.

Measures the north-star metric (BASELINE.json): CLIP ViT-B/16 ReID gallery
embedding extraction at 256x128 / stride-12 overlapping patches, bf16,
preprocessing fused into the same XLA program, single chip. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e4 (the driver's >=1e4 emb/s/chip target).

Timing notes for the axon tunnel: block_until_ready returns before remote
execution completes, so every timing point forces a data dependency by
fetching a scalar from the output; inputs are pre-staged on device the same
way. Param init and the bf16 cast each run as ONE jitted program — per-leaf
dispatch costs seconds/op through the tunnel.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _require_live_tunnel() -> None:
    """Fail fast when the axon TPU tunnel is down: backend init would
    otherwise block forever (the relay at 127.0.0.1:8082+ is host-managed
    and cannot be restarted from this VM), eating the caller's timeout."""
    import os
    import socket

    # key on plugin PRESENCE, not JAX_PLATFORMS: the plugin's backend
    # registration hook blocks even under JAX_PLATFORMS=cpu
    plugin_on_path = any(
        os.path.basename(p.rstrip("/")) == ".axon_site"
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )
    if not plugin_on_path and "axon" not in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        return
    for port in (8082, 8083, 8087):
        s = socket.socket()
        s.settimeout(5)
        try:
            s.connect(("127.0.0.1", port))
            return
        except OSError:
            continue
        finally:
            s.close()
    raise SystemExit(
        "bench: axon TPU tunnel is down (no relay listener on "
        "127.0.0.1:8082+) — refusing to hang in backend init"
    )


def main() -> None:
    _require_live_tunnel()

    import jax
    import jax.numpy as jnp

    from tpu_reid.data.transforms import DevicePreprocess
    from tpu_reid.models import reid_clip as M
    from tpu_reid.parallel.extract import make_extractor, make_scan_extractor

    from __graft_entry__ import _flagship

    from tpu_reid.ops.attention import set_fast_softmax

    set_fast_softmax(True)  # throughput profile (parity evals keep fp32)
    mcfg, params, (h, w) = _flagship()

    @jax.jit
    def to_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            tree,
        )

    params = to_bf16(params)
    pp = DevicePreprocess((h, w), "vit", dtype=jnp.bfloat16)
    # fold the input normalization into the patch-embed weights inside the
    # step (exact math; the normalize pass disappears)
    fold = lambda p: M.fold_input_norm(p, mcfg, "vit")
    extractor = make_extractor(
        lambda p, im: M.eval_embed(p, mcfg, im),
        pp,
        flip_tta=False,
        dtype=jnp.bfloat16,
        fold=fold,
    )
    scan_extractor = make_scan_extractor(
        lambda p, im: M.eval_embed(p, mcfg, im),
        pp,
        flip_tta=False,
        dtype=jnp.bfloat16,
        fold=fold,
    )

    batch, k_batches = 512, 40

    # generate the input gallery ON DEVICE in one jitted program: a
    # host-side device_put of the (K, B, H, W, 3) uint8 stack would move
    # ~1 GB through the tunnel at tens of MB/s (and has been observed to
    # kill the relay); throughput here is data-independent.
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def make_images(key, shape):
        return jax.random.randint(key, shape, 0, 255, dtype=jnp.uint8)

    images = make_images(jax.random.key(0), (batch, h, w, 3))
    images_k = make_images(jax.random.key(1), (k_batches, batch, h, w, 3))
    float(images.sum())  # force materialization before the timed region

    # compile + warmup (scalar fetch forces completion; block_until_ready
    # returns early through the tunnel)
    float(extractor(params, images)[0, 0])
    float(extractor(params, images)[0, 0])

    # per-batch latency: one dispatch, fully fenced
    t0 = time.perf_counter()
    float(extractor(params, images)[0, 0])
    latency = time.perf_counter() - t0

    # throughput: ONE jitted lax.scan program sweeps all K batches —
    # the per-dispatch overhead (~25-30 ms through the remote device
    # link) is paid once, so the wall clock measures the chip's
    # steady-state extraction rate, dispatch included. This is the
    # production shape: extract_embeddings stages the gallery in stacked
    # batches the same way.
    float(scan_extractor(params, images_k)[0, 0, 0])  # compile
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(scan_extractor(params, images_k)[0, 0, 0])
        dt = min(dt, time.perf_counter() - t0)

    emb_per_sec = batch * k_batches / dt
    print(
        f"# per-batch latency {latency * 1e3:.1f} ms "
        f"({batch / latency:.0f} emb/s unpipelined)"
    )

    # production host-fed sweep: host-resident uint8 batches (what a
    # multi-core host's decode pool hands over), device_prefetch
    # overlapping H2D with compute, fenced once at the end. Through the
    # axon tunnel this measures the LINK (~20-50 MB/s observed), not the
    # chip — the chip needs ~270 MB/s to stay fed, which any real TPU
    # host's PCIe H2D exceeds by an order of magnitude. Recorded so the
    # bench states the production pipeline's behavior honestly
    # (BASELINE.md "host-fed extraction" has the full decomposition).
    import numpy as _np

    from tpu_reid.parallel.prefetch import device_prefetch

    k_host = 6
    host_rng = _np.random.RandomState(2)
    host_batches = [
        host_rng.randint(0, 255, (batch, h, w, 3), _np.uint8)
        for _ in range(k_host)
    ]
    feats = []
    t0 = time.perf_counter()
    for d in device_prefetch(iter(host_batches), place=jax.device_put,
                             depth=2):
        feats.append(extractor(params, d))
    float(feats[-1][0, 0])
    for f in feats:
        f.block_until_ready()
    dt_host = (time.perf_counter() - t0) / k_host
    print(
        f"# host-fed pipelined {dt_host * 1e3:.1f} ms/batch "
        f"({batch / dt_host:.0f} emb/s; H2D-link-bound through the "
        "axon tunnel)"
    )
    print(
        json.dumps(
            {
                "metric": "gallery_embeddings_per_sec_per_chip",
                "value": round(emb_per_sec, 1),
                "unit": "emb/s/chip (ViT-B/16 256x128 stride12, bf16, fused preprocess)",
                "vs_baseline": round(emb_per_sec / 1e4, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
