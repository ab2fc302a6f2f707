"""Child process for the multi-host TRAINING parity test.

Joins a 2-process mesh, runs 3 stage-2 steps + 1 live stage-1 step of the
tiny flagship on deterministic synthetic batches (this host placing only
its own batch slice), and writes the loss trajectory to a JSON file. The
parent compares it against the single-process mesh run of the exact same
schedule — gradient psum across processes must not change the math.

Usage: python tests/_mh_train_child.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def batches(h, w, n_cls, global_batch, n_steps):
    """Deterministic global batches — identical on every process."""
    import numpy as np

    rng = np.random.RandomState(0)
    for _ in range(n_steps):
        images = rng.randn(global_batch, h, w, 3).astype(np.float32)
        labels = rng.randint(0, n_cls, global_batch)
        yield images, labels


def run(mesh, place_batch, place_rep, n_procs):
    """The shared schedule; placement differs between parent and child."""
    import numpy as np
    import jax.numpy as jnp

    import __graft_entry__ as g
    from tpu_reid.models import reid_clip as M
    from tpu_reid.train import optim as O
    from tpu_reid.train import trainer as TR

    mcfg, params, (h, w) = g._flagship(tiny=True)
    tcfg = TR.TrainConfig()
    global_batch = 2 * mesh.devices.size  # 2 rows/device (XLA:CPU compile pathology above)

    text_features = M.all_class_text_features(params, mcfg, batch=mcfg.n_cls)
    trainable, frozen = O.partition(
        params, lambda p: M.stage2_trainable(p, mcfg)
    )
    optimizer = O.make_stage_optimizer(tcfg.lr_stage2, bias_lr_mult=2.0)
    opt_state = optimizer.init(trainable)
    step = TR.make_stage2_step(mcfg, tcfg, optimizer, mesh=mesh)

    trainable = place_rep(trainable)
    frozen = place_rep(frozen)
    opt_state = place_rep(opt_state)
    text_features = place_rep(text_features)

    losses = []
    for images, labels in batches(h, w, mcfg.n_cls, global_batch, 3):
        valid = np.ones((global_batch,), bool)
        im, lab, val = place_batch((images, labels, valid))
        trainable, frozen, opt_state, loss = step(
            trainable, frozen, opt_state, im, lab, text_features, val
        )
        losses.append(float(loss))

    # one live (ivlp) stage-1 step on the same first batch
    t1, f1 = O.partition(params, lambda p: M.stage1_trainable(p, mcfg))
    opt1 = O.make_stage_optimizer(tcfg.lr_stage1)
    s1 = TR.make_stage1_step(mcfg, opt1, cached=False, mesh=mesh)
    images, labels = next(batches(h, w, mcfg.n_cls, global_batch, 1))
    batch = place_batch({
        "images": images,
        "labels": labels,
        "valid": np.ones((global_batch,), bool),
    })
    _, _, loss1 = s1(place_rep(t1), place_rep(f1),
                     place_rep(opt1.init(t1)), batch)
    losses.append(float(loss1))
    return losses


def main():
    pid, nproc, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )

    from tpu_reid.parallel.mesh import make_mesh
    from tpu_reid.parallel.multihost import (
        replicate_multihost, shard_batch_multihost,
    )

    mesh = make_mesh()
    per_host = mesh.devices.size * 2 // nproc

    def place_batch(tree):
        # this host contributes only its own contiguous row slice
        sl = slice(pid * per_host, (pid + 1) * per_host)
        local = jax.tree.map(lambda x: x[sl], tree)
        return shard_batch_multihost(mesh, local)

    losses = run(
        mesh, place_batch, lambda t: replicate_multihost(mesh, t), nproc
    )
    with open(out, "w") as fh:
        json.dump(losses, fh)
    print("child", pid, "losses", losses, flush=True)


if __name__ == "__main__":
    main()
