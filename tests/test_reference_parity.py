"""Direct parity against the UPSTREAM reference implementation.

These tests import the reference's own evaluate.py / reranking.py from the
read-only mount at /root/reference (never copied into this repo) and check
that our on-device retrieval tail reproduces its numbers exactly on random
workloads. Skipped when the reference mount is absent.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference mount not available"
)


@pytest.fixture(scope="module")
def reference_modules():
    sys.path.insert(0, REFERENCE)
    try:
        import evaluate as ref_evaluate  # noqa
        import reranking as ref_reranking  # noqa
    finally:
        sys.path.remove(REFERENCE)
    return ref_evaluate, ref_reranking


def _workload(nq=60, ng=200, n_ids=25, dim=32, seed=0, noise=2.0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_ids, dim).astype(np.float32)
    q_pids = rng.randint(0, n_ids, nq)
    g_pids = rng.randint(0, n_ids, ng)
    qf = centers[q_pids] + noise * rng.randn(nq, dim).astype(np.float32)
    gf = centers[g_pids] + noise * rng.randn(ng, dim).astype(np.float32)
    q_cams = rng.randint(0, 6, nq)
    g_cams = rng.randint(0, 6, ng)
    return qf, gf, q_pids, g_pids, q_cams, g_cams


def _assert_rerank_close(ours: np.ndarray, ref) -> None:
    """The reference stores its sparse V in fp16 (reranking.py:50) where we
    keep fp32, so isolated entries differ at the 1e-3 level; require
    near-total elementwise agreement plus identical ranking."""
    ref = np.asarray(ref)
    diff = np.abs(ours - ref)
    tol = 5e-4 + 1e-3 * np.abs(ref)
    frac_close = (diff < tol).mean()
    assert frac_close > 0.999, f"only {frac_close:.4%} within tolerance"
    assert diff.max() < 2e-2, diff.max()
    top1_ours = np.argmin(ours, axis=1)
    top1_ref = np.argmin(ref, axis=1)
    assert (top1_ours == top1_ref).mean() > 0.99


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_cmc_map_matches_reference(reference_modules, seed):
    import torch

    ref_evaluate, _ = reference_modules
    qf, gf, q_pids, g_pids, q_cams, g_cams = _workload(seed=seed)

    ev_ref = ref_evaluate.R1_mAP_eval(
        num_query=len(q_pids), max_rank=10, feat_norm=True
    )
    ev_ref.reset()
    ev_ref.update((
        torch.from_numpy(np.concatenate([qf, gf])),
        torch.from_numpy(np.concatenate([q_pids, g_pids])),
        torch.from_numpy(np.concatenate([q_cams, g_cams])),
    ))
    ref_cmc, ref_map = ev_ref.compute()

    from tpu_reid.retrieval import Evaluator

    ev = Evaluator(num_query=len(q_pids), max_rank=10, feat_norm=True)
    ev.update(qf, q_pids, q_cams)
    ev.update(gf, g_pids, g_cams)
    cmc, mAP = ev.compute()

    # the reference's R1_mAP_eval hardcodes eval_func's max_rank=50 and
    # truncates later; compare the overlapping ranks
    n = min(len(cmc), len(ref_cmc))
    np.testing.assert_allclose(np.asarray(cmc)[:n], np.asarray(ref_cmc)[:n],
                               atol=1e-5)
    assert abs(float(mAP) - float(ref_map)) < 1e-5


def test_rerank_matches_reference(reference_modules):
    import torch

    _, ref_reranking = reference_modules
    qf, gf, *_ = _workload(nq=40, ng=120, seed=2)
    # the reference normalizes features before re-ranking in its eval path
    qf = qf / np.linalg.norm(qf, axis=1, keepdims=True)
    gf = gf / np.linalg.norm(gf, axis=1, keepdims=True)

    ref_dist = ref_reranking.re_ranking(
        torch.from_numpy(qf), torch.from_numpy(gf),
        k1=20, k2=6, lambda_value=0.3,
    )

    from tpu_reid.retrieval import k_reciprocal_rerank

    ours = np.asarray(k_reciprocal_rerank(qf, gf, k1=20, k2=6,
                                          lambda_value=0.3))
    _assert_rerank_close(ours, ref_dist)


@pytest.mark.slow
def test_rerank_eval_params_match_reference(reference_modules):
    """The eval-path parameters k1=50, k2=15 (evaluate.py:127). With k1
    covering ~40% of this small population, fp32 LSB differences in the
    distance matrix flip near-tied neighbor ORDER between torch and jnp and
    cascade through the reciprocal sets, so elementwise comparison is
    ill-posed; the ranking metrics computed FROM the re-ranked matrices are
    the contract."""
    import torch

    _, ref_reranking = reference_modules
    qf, gf, q_pids, g_pids, q_cams, g_cams = _workload(nq=30, ng=90, seed=3)
    qf = qf / np.linalg.norm(qf, axis=1, keepdims=True)
    gf = gf / np.linalg.norm(gf, axis=1, keepdims=True)
    ref_dist = np.asarray(ref_reranking.re_ranking(
        torch.from_numpy(qf), torch.from_numpy(gf),
        k1=50, k2=15, lambda_value=0.3,
    ))
    from tpu_reid.retrieval import cmc_map, k_reciprocal_rerank

    ours = np.asarray(k_reciprocal_rerank(qf, gf, k1=50, k2=15,
                                          lambda_value=0.3))
    cmc_a, map_a = cmc_map(ours, q_pids, g_pids, q_cams, g_cams, max_rank=10)
    cmc_b, map_b = cmc_map(ref_dist, q_pids, g_pids, q_cams, g_cams,
                           max_rank=10)
    assert abs(float(map_a) - float(map_b)) < 5e-3
    np.testing.assert_allclose(np.asarray(cmc_a), np.asarray(cmc_b),
                               atol=0.04)


def test_losses_match_reference():
    """SupCon / triplet / label-smooth CE vs the reference loss module."""
    import torch

    sys.path.insert(0, REFERENCE)
    try:
        import losses as ref_losses
    finally:
        sys.path.remove(REFERENCE)

    import jax.numpy as jnp

    from tpu_reid.train import losses as L

    rng = np.random.RandomState(0)
    feats = rng.randn(16, 24).astype(np.float32)
    labels = np.repeat(np.arange(4), 4)

    # triplet (margin 0.3)
    ref_tri = ref_losses.WeightedRegularizedTriplet(0.3)(
        torch.from_numpy(feats), torch.from_numpy(labels)
    )
    ours_tri = float(L.triplet_loss(jnp.asarray(feats), jnp.asarray(labels),
                                    margin=0.3))
    assert abs(ours_tri - float(ref_tri)) < 1e-4

    # supcon
    text = rng.randn(16, 24).astype(np.float32)
    sc = ref_losses.SupConLoss("cpu")
    ref_sc = sc(torch.from_numpy(text), torch.from_numpy(feats),
                torch.from_numpy(labels), torch.from_numpy(labels))
    ours_sc = float(L.supcon_loss(jnp.asarray(text), jnp.asarray(feats),
                                  jnp.asarray(labels), jnp.asarray(labels)))
    assert abs(ours_sc - float(ref_sc)) < 1e-4

    # label-smooth CE
    logits = rng.randn(16, 9).astype(np.float32)
    tgt = rng.randint(0, 9, 16)
    ce = ref_losses.CrossEntropyLabelSmooth(9, use_gpu=False)
    ref_ce = ce(torch.from_numpy(logits), torch.from_numpy(tgt))
    ours_ce = float(L.cross_entropy_label_smooth(jnp.asarray(logits),
                                                 jnp.asarray(tgt)))
    assert abs(ours_ce - float(ref_ce)) < 1e-4
