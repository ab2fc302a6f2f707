"""Pipelined host-fed production extraction probe (r5, VERDICT r4 ask #1b).

Measures the PRODUCTION path: host-resident uint8 batches (what a
multi-core host's decode pool hands over) -> device_prefetch-overlapped
H2D -> make_extractor dispatches, fenced only at the end; plus the same
sweep fenced per batch, and H2D alone.

Measured r5 at bs=512 (v5e, axon tunnel): unpipelined 328 emb/s,
pipelined depth-2 501 emb/s (+53%), H2D alone 19-50 MB/s — the tunnel
link, not the framework, binds host-fed extraction on this rig
(BASELINE.md "host-fed extraction decomposition").

Usage: python tools_h2d_pipe.py [batch] [k_batches]
"""
import sys, time
import numpy as np



import jax
import jax.numpy as jnp

from tpu_reid.data.transforms import DevicePreprocess
from tpu_reid.models import reid_clip as M
from tpu_reid.parallel.extract import make_extractor, make_scan_extractor
from tpu_reid.parallel.prefetch import device_prefetch
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
fold = lambda p: M.fold_input_norm(p, mcfg, "vit")
extractor = make_extractor(
    lambda p, im: M.eval_embed(p, mcfg, im), pp,
    flip_tta=False, dtype=jnp.bfloat16, fold=fold,
)

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 24
rng = np.random.RandomState(0)
host_batches = [
    rng.randint(0, 255, (BS, h, w, 3), np.uint8) for _ in range(K)
]

# warm/compile
a = jax.device_put(host_batches[0])
float(extractor(params, a)[0, 0])
float(extractor(params, a)[0, 0])

def fence(x):
    float(jnp.asarray(x).ravel()[0].astype(jnp.float32))

# --- unpipelined: fenced H2D + fenced compute per batch ---
t0 = time.perf_counter()
for b in host_batches[:8]:
    d = jax.device_put(b)
    fence(extractor(params, d))
t_unpiped = (time.perf_counter() - t0) / 8
print(f"unpipelined host-fed: {t_unpiped*1e3:.1f} ms/batch "
      f"({BS/t_unpiped:.0f} emb/s)", flush=True)

# --- pipelined: prefetch H2D on a worker thread, fence only at the end ---
for depth in (2, 4):
    feats = []
    t0 = time.perf_counter()
    for d in device_prefetch(iter(host_batches), place=jax.device_put,
                             depth=depth):
        feats.append(extractor(params, d))
    for f in feats:
        f.block_until_ready()
    fence(feats[-1])
    dt = (time.perf_counter() - t0) / K
    print(f"pipelined depth={depth}: {dt*1e3:.1f} ms/batch "
          f"({BS/dt:.0f} emb/s)", flush=True)

# --- H2D alone (fenced) ---
t0 = time.perf_counter()
for b in host_batches[:8]:
    d = jax.device_put(b)
    float(d[0, 0, 0, 0])
t_h2d = (time.perf_counter() - t0) / 8
mb = BS * h * w * 3 / 2**20
print(f"H2D alone: {t_h2d*1e3:.1f} ms/batch ({mb/t_h2d:.0f} MB/s)",
      flush=True)
print("OK", flush=True)
