"""Host-PIL preprocessing + device-semantics flip-TTA at Market scale.

Isolates numerical preprocessing parity from the TTA semantic divergence
(DIVERGENCES #14): same deterministic flip-TTA as the device path, but
resize/normalize on host via PIL. Expected: mAP within 0.1 points of the
device path (the 1.7-point delta in /tmp/map_results.json is the
reference-faithful random pad+crop second pass, not numerics).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_reid.data.datasets import get_dataset
from tpu_reid.data.loader import BatchLoader
from tpu_reid.data.transforms import host_test_transform
from tpu_reid.pipelines import zero_shot as Z
from tpu_reid.retrieval.metrics import Evaluator
from tpu_reid.weights.convert import convert_clip, load_state_dict

ROOT = "/tmp/market_scale"
H, W, BS = 256, 128, 256

t0 = time.time()
sd = load_state_dict(f"{ROOT}/vit_b16_random.pth")
cfg, params = convert_clip(sd, image_hw=(H, W), stride=12)
params = jax.tree.map(jnp.asarray, params)
dataset = get_dataset(ROOT, "market1501")
embed = Z.make_zeroshot_embed(params, cfg)

step = jax.jit(
    lambda p, x: (
        embed(p, x.astype(jnp.bfloat16))
        + embed(p, x.astype(jnp.bfloat16)[:, :, ::-1])
    ) * 0.5
)


def sweep(records):
    feats, pids, cams = [], [], []
    for b in BatchLoader(records, BS, (H, W),
                         transform=lambda im: host_test_transform(im, (H, W)),
                         backend="pil"):
        f = step(params, jnp.asarray(b.images))
        v = np.asarray(b.valid)
        feats.append(np.asarray(f)[v])
        pids.append(b.pids[v]); cams.append(b.camids[v])
    return np.concatenate(feats), np.concatenate(pids), np.concatenate(cams)


gf, gp, gc = sweep(dataset.gallery)
qf, qp, qc = sweep(dataset.query)
print(f"[{time.time()-t0:.0f}s] swept")

ev = Evaluator(num_query=len(qp), max_rank=50, feat_norm=True)
ev.update(jnp.asarray(np.concatenate([qf, gf])), np.concatenate([qp, gp]),
          np.concatenate([qc, gc]))
cmc, mAP = ev.compute()
res = {"host_pil_det_tta": {"rank1": float(cmc[0]), "mAP": float(mAP)}}
print(json.dumps(res, indent=1))
with open("/tmp/map_results2.json", "w") as f:
    json.dump(res, f, indent=1)
print(f"TOTAL {time.time()-t0:.0f}s")
