"""Loss + LR-schedule parity vs torch / published formulas."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_reid.train import losses as L
from tpu_reid.train import schedules as S

RNG = np.random.RandomState(7)


def _pk_labels(p=4, k=4):
    return np.repeat(np.arange(p), k)


def test_euclidean_dist_matches_torch():
    x = RNG.randn(6, 8).astype(np.float32)
    y = RNG.randn(5, 8).astype(np.float32)
    ours = np.asarray(L.euclidean_dist(jnp.asarray(x), jnp.asarray(y)))
    ref = torch.cdist(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_triplet_matches_torch_margin_ranking():
    labels = _pk_labels()
    feat = RNG.randn(16, 32).astype(np.float32)
    ours = float(L.triplet_loss(jnp.asarray(feat), jnp.asarray(labels), margin=0.3))

    # torch oracle: batch-hard mining + MarginRankingLoss
    t = torch.from_numpy(feat)
    dist = torch.cdist(t, t)
    lab = torch.from_numpy(labels)
    is_pos = lab[:, None] == lab[None, :]
    d_ap = dist.masked_fill(~is_pos, float("-inf")).max(1).values
    d_an = dist.masked_fill(is_pos, float("inf")).min(1).values
    ref = F.margin_ranking_loss(d_an, d_ap, torch.ones_like(d_an), margin=0.3)
    assert abs(ours - float(ref)) < 1e-4


def test_triplet_soft_margin():
    labels = _pk_labels()
    feat = RNG.randn(16, 32).astype(np.float32)
    ours = float(L.triplet_loss(jnp.asarray(feat), jnp.asarray(labels), margin=None))
    t = torch.from_numpy(feat)
    dist = torch.cdist(t, t)
    lab = torch.from_numpy(labels)
    is_pos = lab[:, None] == lab[None, :]
    d_ap = dist.masked_fill(~is_pos, float("-inf")).max(1).values
    d_an = dist.masked_fill(is_pos, float("inf")).min(1).values
    ref = F.soft_margin_loss(d_an - d_ap, torch.ones_like(d_an))
    assert abs(ours - float(ref)) < 1e-4


def test_triplet_xbm_self_exclusion():
    labels = _pk_labels(p=2, k=2)  # 4 anchors
    feat = RNG.randn(4, 8).astype(np.float32)
    bank = np.concatenate([feat, RNG.randn(4, 8).astype(np.float32)])
    bank_labels = np.concatenate([labels, _pk_labels(p=2, k=2)])
    # anchors sit in bank slots 0..3; self-distance (0) must not be chosen
    # as the hardest positive maximum? self dist is 0 => min, it could be
    # chosen as hardest NEGATIVE (dist 0) if not excluded, breaking the loss.
    loss_excl = float(
        L.triplet_loss_xbm(
            jnp.asarray(feat), jnp.asarray(labels),
            jnp.asarray(bank), jnp.asarray(bank_labels),
            margin=0.3, self_cols=jnp.arange(4),
        )
    )
    loss_noexcl = float(
        L.triplet_loss_xbm(
            jnp.asarray(feat), jnp.asarray(labels),
            jnp.asarray(bank), jnp.asarray(bank_labels),
            margin=0.3,
        )
    )
    assert np.isfinite(loss_excl)
    # without exclusion the anchor matches itself at distance ~0 as positive:
    # hardest-positive distance can only grow when it is excluded
    assert loss_excl >= loss_noexcl - 1e-6


def test_supcon_matches_torch():
    text = RNG.randn(8, 16).astype(np.float32)
    image = RNG.randn(12, 16).astype(np.float32)
    tl = RNG.randint(0, 4, 8)
    il = RNG.randint(0, 4, 12)
    ours = float(
        L.supcon_loss(jnp.asarray(text), jnp.asarray(image),
                      jnp.asarray(tl), jnp.asarray(il))
    )
    tt, ti = torch.from_numpy(text), torch.from_numpy(image)
    mask = (torch.from_numpy(tl)[:, None] == torch.from_numpy(il)[None, :]).float()
    logits = tt @ ti.T
    logits = logits - logits.max(1, keepdim=True).values
    log_prob = logits - torch.log(torch.exp(logits).sum(1, keepdim=True))
    ref = -((mask * log_prob).sum(1) / mask.sum(1)).mean()
    assert abs(ours - float(ref)) < 1e-4


def test_ce_label_smooth_matches_torch():
    logits = RNG.randn(10, 7).astype(np.float32)
    labels = RNG.randint(0, 7, 10)
    ours = float(
        L.cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(labels))
    )
    lp = F.log_softmax(torch.from_numpy(logits), dim=1)
    tgt = torch.zeros(10, 7).scatter_(1, torch.from_numpy(labels)[:, None], 1)
    tgt = 0.9 * tgt + 0.1 / 7
    ref = (-tgt * lp).mean(0).sum()
    assert abs(ours - float(ref)) < 1e-4


def test_plain_ce_matches_torch():
    logits = RNG.randn(10, 7).astype(np.float32)
    labels = RNG.randint(0, 7, 10)
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels))
    assert abs(ours - float(ref)) < 1e-4


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def test_cosine_warmup_schedule():
    base, total = 3.5e-4, 120
    # warmup: linear from warmup_lr_init
    assert S.cosine_warmup_lr(0, base, total) == pytest.approx(1e-5)
    step = (base - 1e-5) / 5
    assert S.cosine_warmup_lr(3, base, total) == pytest.approx(1e-5 + 3 * step)
    # past warmup: cosine on the FULL horizon (warmup_prefix=False)
    e = 60
    expect = 1e-6 + 0.5 * (base - 1e-6) * (1 + math.cos(math.pi * e / total))
    assert S.cosine_warmup_lr(e, base, total) == pytest.approx(expect)
    # past the single cycle: pinned at lr_min
    assert S.cosine_warmup_lr(total + 1, base, total) == pytest.approx(1e-6)


def test_warmup_multistep_schedule():
    base = 5e-6
    # epoch 0: warmup_factor * base
    assert S.warmup_multistep_lr(0, base) == pytest.approx(0.1 * base)
    # linear ramp: epoch 5 of 10 -> factor 0.55
    assert S.warmup_multistep_lr(5, base) == pytest.approx(0.55 * base)
    # after warmup, before milestones
    assert S.warmup_multistep_lr(20, base) == pytest.approx(base)
    # post-milestone decays
    assert S.warmup_multistep_lr(35, base) == pytest.approx(0.1 * base)
    assert S.warmup_multistep_lr(55, base) == pytest.approx(0.01 * base)


def test_flat_adam_matches_per_leaf_chain():
    """optim.flat_torch_adam (one fused vector program, the default) must
    produce EXACTLY the per-leaf torch_adam chain's trajectory — decay,
    bias-leaf x2 lr, bias-corrected moments — over several steps (r5; the
    flat form removes ~19 ms/step of per-kernel overhead at ViT-B bs=64)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_reid.train import optim as O

    rng = np.random.RandomState(3)
    params = {
        "blk": {
            "w": jnp.asarray(rng.randn(8, 16).astype(np.float32)),
            "b": jnp.asarray(rng.randn(16).astype(np.float32)),
        },
        "ln": {
            "scale": jnp.asarray(rng.randn(16).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(16).astype(np.float32)),
        },
        "frozen": None,  # partitioned-out leaf must flatten consistently
    }
    opt_a = O.make_stage_optimizer(1e-3, 1e-4, bias_lr_mult=2.0, flat=False)
    opt_b = O.make_stage_optimizer(1e-3, 1e-4, bias_lr_mult=2.0, flat=True)
    sa, sb = opt_a.init(params), opt_b.init(params)
    pa = pb = params
    for step in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                rng.randn(*np.shape(p)).astype(np.float32)
            ),
            pa,
        )
        ua, sa = opt_a.update(grads, sa, pa)
        ub, sb = opt_b.update(grads, sb, pb)
        pa = optax.apply_updates(pa, ua)
        pb = optax.apply_updates(pb, ub)
        # lr schedule injection works on both
        sa.hyperparams["learning_rate"] = jnp.asarray(5e-4 / (step + 1))
        sb.hyperparams["learning_rate"] = jnp.asarray(5e-4 / (step + 1))
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-6)
