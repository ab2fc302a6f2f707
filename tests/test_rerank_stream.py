"""Streamed exact-neighborhood re-ranking vs the dense exact path.

The streamed path (retrieval/rerank_stream.py) must reproduce the dense
`k_reciprocal_rerank` (itself exact-parity-tested against the reference
algorithm in tests/test_reference_parity.py) — exactly when run without
quantization, and within a measured tolerance with its production
bf16/fp8 value quantization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_reid.ops.minsum import minsum_reference, minsum_tiled
from tpu_reid.retrieval.rerank import k_reciprocal_rerank
from tpu_reid.retrieval.rerank_stream import k_reciprocal_rerank_streamed
from tests.golden import golden_cmc_map


def _workload(seed=0, n_ids=30, nq=60, ng=200, d=32, noise=0.7):
    rng = np.random.RandomState(seed)
    ids_q = rng.randint(0, n_ids, nq)
    ids_g = rng.randint(0, n_ids, ng)
    centers = rng.randn(n_ids, d).astype(np.float32)
    qf = centers[ids_q] + noise * rng.randn(nq, d).astype(np.float32)
    gf = centers[ids_g] + noise * rng.randn(ng, d).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=1, keepdims=True)
    gf /= np.linalg.norm(gf, axis=1, keepdims=True)
    return qf, gf, ids_q, ids_g


@pytest.mark.slow
def test_streamed_fp32_matches_exact():
    """Without quantization the streamed pipeline (global blockwise ranks,
    sparse V via sort-dedup, scatter-add QE, min-sum contraction) is the
    same algorithm as the dense path — results must agree to fp rounding."""
    qf, gf, _, _ = _workload()
    exact = np.asarray(k_reciprocal_rerank(qf, gf, k1=20, k2=6))
    streamed = np.asarray(
        k_reciprocal_rerank_streamed(
            qf, gf, k1=20, k2=6,
            val_dtype=jnp.float32, qe_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(streamed, exact, atol=2e-5)


@pytest.mark.slow
def test_streamed_fp32_odd_blocks_invariant():
    """Block sizes are an implementation detail: odd row/col blocks must
    not change results."""
    qf, gf, _, _ = _workload(seed=3, nq=47, ng=193)
    a = np.asarray(
        k_reciprocal_rerank_streamed(
            qf, gf, k1=15, k2=4, row_block=64,
            val_dtype=jnp.float32, qe_dtype=jnp.float32,
        )
    )
    b = np.asarray(
        k_reciprocal_rerank_streamed(
            qf, gf, k1=15, k2=4, row_block=29, block_c=384,
            val_dtype=jnp.float32, qe_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_streamed_k2_1_no_query_expansion():
    qf, gf, _, _ = _workload(seed=5)
    exact = np.asarray(k_reciprocal_rerank(qf, gf, k1=20, k2=1))
    streamed = np.asarray(
        k_reciprocal_rerank_streamed(
            qf, gf, k1=20, k2=1,
            val_dtype=jnp.float32, qe_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(streamed, exact, atol=2e-5)


@pytest.mark.slow
def test_streamed_quantized_map_parity():
    """Production dtypes (bf16 sparse V, fp8 V_qe): the metric the
    quantization must preserve is mAP/CMC, not raw distances. Uses noise
    high enough that accuracy is non-trivial."""
    qf, gf, ids_q, ids_g = _workload(seed=7, nq=120, ng=400, noise=0.9)
    camq = np.zeros(len(ids_q), np.int64)
    camg = np.ones(len(ids_g), np.int64)
    exact = np.asarray(k_reciprocal_rerank(qf, gf, k1=20, k2=6))
    streamed = np.asarray(k_reciprocal_rerank_streamed(qf, gf, k1=20, k2=6))
    cmc_e, map_e = golden_cmc_map(exact, ids_q, ids_g, camq, camg, 10)
    cmc_s, map_s = golden_cmc_map(streamed, ids_q, ids_g, camq, camg, 10)
    assert map_e > 0.3  # non-trivial workload
    assert abs(map_e - map_s) < 0.005
    assert abs(cmc_e[0] - cmc_s[0]) < 0.02


def test_minsum_tiled_matches_reference():
    """The Pallas kernel's grid/tiling (interpret mode on CPU) against the
    XLA broadcast-min-reduce oracle, with row-quantized fp8 operands and
    deliberately awkward shapes."""
    rng = np.random.RandomState(1)
    a = (rng.rand(70, 300) ** 3).astype(np.float32)
    b = (rng.rand(130, 300) ** 3).astype(np.float32)
    asc = a.max(1) / 448.0
    bsc = b.max(1) / 448.0
    a8 = jnp.asarray(a / asc[:, None], jnp.float8_e4m3fn)
    b8 = jnp.asarray(b / bsc[:, None], jnp.float8_e4m3fn)
    ref = np.asarray(minsum_reference(a8, jnp.asarray(asc), b8, jnp.asarray(bsc)))
    out = np.asarray(
        minsum_tiled(
            a8, jnp.asarray(asc), b8, jnp.asarray(bsc),
            block_a=32, block_b=128, block_c=128, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_minsum_zero_padding_exact():
    """Non-negative rows: zero padding of rows/cols must contribute 0."""
    rng = np.random.RandomState(2)
    a = rng.rand(9, 130).astype(np.float32)
    b = rng.rand(17, 130).astype(np.float32)
    ones_a, ones_b = np.ones(9, np.float32), np.ones(17, np.float32)
    ref = np.minimum(a[:, None, :], b[None, :, :]).sum(-1)
    out = np.asarray(
        minsum_tiled(
            jnp.asarray(a), jnp.asarray(ones_a),
            jnp.asarray(b), jnp.asarray(ones_b),
            block_a=8, block_b=128, block_c=128, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_streamed_rows_match_dense():
    """The chunked row provider must reconstruct the dense streamed result
    exactly (same pipeline, blend sliced per chunk) — including a tail
    chunk that doesn't divide num_q and the metric-layer consumption."""
    from tpu_reid.retrieval.metrics import cmc_map, cmc_map_from_rows
    from tpu_reid.retrieval.rerank_stream import (
        k_reciprocal_rerank_streamed_rows,
    )

    qf, gf, ids_q, ids_g = _workload(seed=13, nq=37, ng=150, noise=0.8)
    dense = np.asarray(
        k_reciprocal_rerank_streamed(
            qf, gf, k1=15, k2=5,
            val_dtype=jnp.float32, qe_dtype=jnp.float32,
        )
    )
    row_fn, qc = k_reciprocal_rerank_streamed_rows(
        qf, gf, k1=15, k2=5, q_chunk=16,
        val_dtype=jnp.float32, qe_dtype=jnp.float32,
    )
    assert qc == 16
    rebuilt = np.concatenate(
        [np.asarray(row_fn(s)) for s in range(0, 37, qc)]
    )[:37]
    np.testing.assert_allclose(rebuilt, dense, atol=2e-5)

    camq = np.zeros(len(ids_q), np.int64)
    camg = np.ones(len(ids_g), np.int64)
    cmc_d, map_d = cmc_map(
        jnp.asarray(dense), ids_q, ids_g, camq, camg, max_rank=10
    )
    cmc_r, map_r = cmc_map_from_rows(
        row_fn, qc, ids_q, ids_g, camq, camg, max_rank=10
    )
    np.testing.assert_allclose(np.asarray(cmc_r), np.asarray(cmc_d), atol=1e-6)
    np.testing.assert_allclose(float(map_r), float(map_d), atol=1e-6)


@pytest.mark.slow
def test_evaluator_streamed_mode():
    """Evaluator(rerank_mode='streamed') runs the streamed path end to end
    and lands within tolerance of rerank_mode='exact'."""
    from tpu_reid.retrieval.metrics import Evaluator

    qf, gf, ids_q, ids_g = _workload(seed=11, nq=80, ng=300, noise=0.8)
    feats = np.concatenate([qf, gf], axis=0)
    pids = np.concatenate([ids_q, ids_g])
    camids = np.concatenate(
        [np.zeros(len(ids_q), np.int64), np.ones(len(ids_g), np.int64)]
    )
    results = {}
    for mode in ("exact", "streamed"):
        ev = Evaluator(
            num_query=len(ids_q), max_rank=10, reranking=True,
            rerank_params=(20, 6, 0.3), rerank_mode=mode,
        )
        ev.update(jnp.asarray(feats), pids, camids)
        cmc, mAP = ev.compute()
        results[mode] = (cmc, mAP)
    assert abs(results["exact"][1] - results["streamed"][1]) < 0.005
    assert abs(results["exact"][0][0] - results["streamed"][0][0]) < 0.02


@pytest.mark.slow
def test_streamed_sharded_matches_single_device():
    """The multi-chip streamed path (every pass row-sharded over the
    8-device mesh, gallery-side V_qe and t left sharded) computes the
    IDENTICAL per-row math as the single-device pipeline — dense results
    must agree to fp rounding, including when neither num_q nor num_g
    divides the device count."""
    from tpu_reid.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    for seed, nq, ng in [(21, 45, 187), (22, 64, 256), (23, 5, 61)]:
        qf, gf, _, _ = _workload(seed=seed, nq=nq, ng=ng)
        single = np.asarray(
            k_reciprocal_rerank_streamed(qf, gf, k1=15, k2=5)
        )
        sharded = np.asarray(
            k_reciprocal_rerank_streamed(qf, gf, k1=15, k2=5, mesh=mesh)
        )
        np.testing.assert_allclose(sharded, single, atol=2e-5)


@pytest.mark.slow
def test_streamed_sharded_rows_and_evaluator():
    """Mesh-sharded rows provider + Evaluator(mesh=...) reproduce the
    single-device streamed metrics exactly."""
    from tpu_reid.parallel.mesh import make_mesh
    from tpu_reid.retrieval.metrics import Evaluator

    mesh = make_mesh(n_data=8)
    qf, gf, ids_q, ids_g = _workload(seed=31, nq=53, ng=211, noise=0.8)
    feats = np.concatenate([qf, gf], axis=0)
    pids = np.concatenate([ids_q, ids_g])
    camids = np.concatenate(
        [np.zeros(len(ids_q), np.int64), np.ones(len(ids_g), np.int64)]
    )
    results = {}
    for m in (None, mesh):
        ev = Evaluator(
            num_query=len(ids_q), max_rank=10, reranking=True,
            rerank_params=(15, 5, 0.3), rerank_mode="streamed", mesh=m,
        )
        ev.update(jnp.asarray(feats), pids, camids)
        results[m is not None] = ev.compute()
    np.testing.assert_allclose(
        results[True][0], results[False][0], atol=1e-6
    )
    np.testing.assert_allclose(
        results[True][1], results[False][1], atol=1e-6
    )
