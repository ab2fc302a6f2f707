import numpy as np
import jax.numpy as jnp
import pytest

from tpu_reid.retrieval import cmc_map, euclidean_distmat, cosine_distmat, l2_normalize
from tpu_reid.retrieval.metrics import Evaluator
from tests.golden import golden_cmc_map


def _random_reid_problem(rng, num_q=40, num_g=200, num_ids=15, num_cams=6, dim=16):
    q_pids = rng.integers(0, num_ids, num_q)
    g_pids = rng.integers(0, num_ids, num_g)
    q_camids = rng.integers(0, num_cams, num_q)
    g_camids = rng.integers(0, num_cams, num_g)
    centers = rng.normal(size=(num_ids, dim))
    qf = centers[q_pids] + 0.5 * rng.normal(size=(num_q, dim))
    gf = centers[g_pids] + 0.5 * rng.normal(size=(num_g, dim))
    return (
        qf.astype(np.float32),
        gf.astype(np.float32),
        q_pids,
        g_pids,
        q_camids,
        g_camids,
    )


def test_euclidean_distmat_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(7, 5)).astype(np.float32)
    g = rng.normal(size=(11, 5)).astype(np.float32)
    got = np.asarray(euclidean_distmat(q, g))
    want = ((q[:, None, :] - g[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_cosine_distmat_matches_numpy():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(6, 8)).astype(np.float32)
    g = rng.normal(size=(9, 8)).astype(np.float32)
    got = np.asarray(cosine_distmat(q, g))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    want = np.arccos(np.clip(qn @ gn.T, -1 + 1e-5, 1 - 1e-5))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cmc_map_matches_golden(seed):
    rng = np.random.default_rng(seed)
    qf, gf, q_pids, g_pids, q_camids, g_camids = _random_reid_problem(rng)
    distmat = ((qf[:, None, :] - gf[None, :, :]) ** 2).sum(-1)

    want_cmc, want_map = golden_cmc_map(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    got_cmc, got_map = cmc_map(
        jnp.asarray(distmat),
        jnp.asarray(q_pids),
        jnp.asarray(g_pids),
        jnp.asarray(q_camids),
        jnp.asarray(g_camids),
        max_rank=10,
    )
    np.testing.assert_allclose(np.asarray(got_cmc), want_cmc, atol=1e-5)
    assert abs(float(got_map) - want_map) < 1e-5


def test_cmc_map_excludes_unmatchable_queries():
    # query pid 99 never occurs in the gallery -> excluded from averages
    distmat = np.array([[0.1, 0.2, 0.3], [0.3, 0.2, 0.1]], np.float32)
    q_pids = np.array([1, 99])
    g_pids = np.array([1, 2, 3])
    cams_q = np.array([0, 0])
    cams_g = np.array([1, 1, 1])
    cmc, mean_ap = cmc_map(
        jnp.asarray(distmat),
        jnp.asarray(q_pids),
        jnp.asarray(g_pids),
        jnp.asarray(cams_q),
        jnp.asarray(cams_g),
        max_rank=3,
    )
    np.testing.assert_allclose(np.asarray(cmc), [1.0, 1.0, 1.0])
    assert float(mean_ap) == pytest.approx(1.0)


def test_cmc_map_same_camera_filtering():
    # the only gallery match shares the camera -> query becomes invalid
    distmat = np.array([[0.1, 0.2]], np.float32)
    cmc, mean_ap = cmc_map(
        jnp.asarray(distmat),
        jnp.asarray([5]),
        jnp.asarray([5, 7]),
        jnp.asarray([2]),
        jnp.asarray([2, 2]),
        max_rank=2,
    )
    assert float(mean_ap) == 0.0
    np.testing.assert_allclose(np.asarray(cmc), [0.0, 0.0])


def test_evaluator_accumulates_batches():
    rng = np.random.default_rng(3)
    qf, gf, q_pids, g_pids, q_camids, g_camids = _random_reid_problem(rng)
    feats = np.concatenate([qf, gf])
    pids = np.concatenate([q_pids, g_pids])
    camids = np.concatenate([q_camids, g_camids])

    ev = Evaluator(num_query=len(qf), max_rank=10)
    for i in range(0, len(feats), 32):
        ev.update(feats[i : i + 32], pids[i : i + 32], camids[i : i + 32])
    cmc, mean_ap = ev.compute()

    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    dm = ((fn[: len(qf), None, :] - fn[None, len(qf) :, :]) ** 2).sum(-1)
    want_cmc, want_map = golden_cmc_map(
        dm, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    np.testing.assert_allclose(cmc, want_cmc, atol=1e-5)
    assert mean_ap == pytest.approx(want_map, abs=1e-5)


def test_blockwise_topk_matches_full_matrix():
    import numpy as np

    from tpu_reid.retrieval.topk import blockwise_topk

    rng = np.random.RandomState(0)
    q = rng.randn(17, 12).astype(np.float32)
    g = rng.randn(103, 12).astype(np.float32)
    d, i = blockwise_topk(q, g, k=7, block=16)
    full = ((q ** 2).sum(1)[:, None] + (g ** 2).sum(1)[None, :]
            - 2 * q @ g.T)
    want_i = np.argsort(full, axis=1)[:, :7]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-3, rtol=1e-4)
    # indices may differ only at exact-distance ties (none with randoms)
    np.testing.assert_array_equal(np.asarray(i), want_i)


def test_blockwise_topk_edges():
    import numpy as np

    from tpu_reid.retrieval.topk import blockwise_topk, retrieve

    rng = np.random.RandomState(1)
    q = rng.randn(3, 8).astype(np.float32)
    g = rng.randn(5, 8).astype(np.float32)
    # k > gallery size clamps; block > gallery works
    d, i = blockwise_topk(q, g, k=50, block=1000)
    assert d.shape == (3, 5) and i.shape == (3, 5)
    assert np.isfinite(np.asarray(d)).all()
    # retrieve() normalized: self-retrieval puts each gallery row first
    d2, i2 = retrieve(g, g, k=1)
    np.testing.assert_array_equal(np.asarray(i2)[:, 0], np.arange(5))


def test_cmc_map_chunking_invariant():
    """q_chunk must not change results (incl. padded tail chunks)."""
    import numpy as np

    from tpu_reid.retrieval.metrics import cmc_map

    rng = np.random.RandomState(3)
    nq, ng = 23, 40
    dm = rng.rand(nq, ng).astype(np.float32)
    q_pids = rng.randint(0, 9, nq)
    g_pids = rng.randint(0, 9, ng)
    q_cams = rng.randint(0, 3, nq)
    g_cams = rng.randint(0, 3, ng)
    cmc_a, map_a = cmc_map(dm, q_pids, g_pids, q_cams, g_cams, 10,
                           q_chunk=7)
    cmc_b, map_b = cmc_map(dm, q_pids, g_pids, q_cams, g_cams, 10,
                           q_chunk=10_000)
    np.testing.assert_allclose(np.asarray(cmc_a), np.asarray(cmc_b),
                               atol=1e-6)
    assert abs(float(map_a) - float(map_b)) < 1e-6


@pytest.mark.parametrize("seed", [0, 7])
def test_minp_matches_golden(seed):
    """mINP (Ye et al. TPAMI'21 — a metric the reference protocol lacks)
    matches the per-query-loop golden, is chunking-invariant, and rides
    the same sufficient-statistics pass as CMC/mAP."""
    from tests.golden import golden_minp

    rng = np.random.default_rng(seed)
    qf, gf, q_pids, g_pids, q_cams, g_cams = _random_reid_problem(rng)
    dm = np.asarray(euclidean_distmat(qf, gf))
    want = golden_minp(dm, q_pids, g_pids, q_cams, g_cams)
    cmc, mAP, minp = cmc_map(dm, q_pids, g_pids, q_cams, g_cams, 10,
                             with_minp=True)
    assert abs(float(minp) - want) < 1e-5
    # chunked tail path agrees
    _, _, minp_c = cmc_map(dm, q_pids, g_pids, q_cams, g_cams, 10,
                           q_chunk=7, with_minp=True)
    assert abs(float(minp_c) - want) < 1e-5
    assert 0.0 < float(minp) <= 1.0


def test_evaluator_with_minp():
    rng = np.random.default_rng(11)
    qf, gf, q_pids, g_pids, q_cams, g_cams = _random_reid_problem(rng)
    ev = Evaluator(num_query=len(q_pids), max_rank=10, with_minp=True)
    ev.update(jnp.asarray(qf), q_pids, q_cams)
    ev.update(jnp.asarray(gf), g_pids, g_cams)
    cmc, mAP, minp = ev.compute()
    from tests.golden import golden_minp

    dm = np.asarray(euclidean_distmat(
        np.asarray(l2_normalize(jnp.asarray(qf), axis=1)),
        np.asarray(l2_normalize(jnp.asarray(gf), axis=1)),
    ))
    want = golden_minp(dm, q_pids, g_pids, q_cams, g_cams)
    assert abs(minp - want) < 1e-5
