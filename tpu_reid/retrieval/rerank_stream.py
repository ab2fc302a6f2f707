"""Exact-neighborhood k-reciprocal re-ranking for very large populations.

The reference algorithm (reference: reranking.py:29-100) and the rebuild's
small-population path (`rerank.k_reciprocal_rerank`) both hold dense
(Q+G)^2 fp32 matrices; at MSMT17 scale (n = 93,820) that is ~35GB per
matrix — more than any single accelerator's HBM, and the reason the
Evaluator previously fell back to per-shard re-ranking whose SHARD-LOCAL
neighborhoods cost a measured 1.74 mAP points (docs/DIVERGENCES.md #15).

This module computes the same algorithm with GLOBAL neighborhoods at any
population that fits features in HBM, by never materializing a dense
fp32 n x n matrix:

  A. global top-(k1+1) neighbor lists + per-row distance max, blockwise
     (no all-pairs matrix; two streamed distance passes total),
  B. the sparse-V insight: every V row has at most
     E = (k1+1)*(kh+1) ~ 1.4k nonzeros (the expansion-set bound), so V
     is stored as per-row (index, value) pairs — sort + first-occurrence
     dedup replaces the dense scatter-max (~0.8GB at MSMT17, not 35GB),
  C. query-expanded rows V_qe (reference: reranking.py:73-77) are
     densified by scatter-add of k2 sparse rows and stored row-quantized
     (fp8 values + fp32 per-row scale: 8.2GB at MSMT17 — fits HBM),
  D. the Jaccard min-sum contraction runs as a VMEM-tiled Pallas kernel
     (`ops.minsum`), and the final blend tracks the TRUE post-quantization
     row sums sA/sB (jaccard = 1 - t/(sA+sB-t)), removing the first-order
     quantization bias of assuming unit row sums.

Approximation story: neighborhoods, expansion sets and acceptance tests
are EXACT (integer decisions from global rank lists); the only error is
value quantization (bf16 sparse V, fp8 V_qe), measured in
tests/test_rerank_stream.py and BASELINE.md against the fully-exact path
on populations where both run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_reid.ops.minsum import minsum
from tpu_reid.retrieval.rerank import _expansion_sets

_HIGHEST = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_blocks(n: int, block: int) -> jax.Array:
    nb = -(-n // block)
    return jnp.arange(nb * block).reshape(nb, block)


def _dist_rows(feat: jax.Array, sq: jax.Array, rows: jax.Array) -> jax.Array:
    """(B, n) squared-euclidean rows, fp32-accumulated (parity with
    retrieval.distance.euclidean_distmat)."""
    cross = jnp.dot(feat[rows], feat.T, precision=_HIGHEST,
                    preferred_element_type=jnp.float32)
    return sq[rows][:, None] + sq[None, :] - 2.0 * cross


def _global_ranks_core(feat, start, *, n, k1p, row_block, n_out):
    """Pass A body for rows [start, start+n_out) of the population.

    The reference normalizes by per-column max then transposes
    (reranking.py:46); for the symmetric all-pairs matrix that equals
    dividing each row by its own max, which is rank-preserving — so
    top-k runs on raw distances and the max is carried for the exp(-od)
    weights. `start` may be traced (the multi-chip path derives it from
    `lax.axis_index`)."""
    sq = jnp.sum(feat * feat, axis=1)

    def blk(rows):
        safe = jnp.minimum(start + rows, n - 1)
        d = _dist_rows(feat, sq, safe)
        neg, idx = lax.top_k(-d, k1p)
        return jnp.max(d, axis=1), idx.astype(jnp.int32)

    rm, rk = lax.map(blk, _row_blocks(n_out, row_block))
    return rm.reshape(-1)[:n_out], rk.reshape(-1, k1p)[:n_out]


@functools.partial(jax.jit, static_argnames=("k1p", "row_block"))
def _global_ranks(feat, k1p, row_block):
    """Pass A: top-(k1+1) lists (n, k1+1) + per-row distance max (n,)."""
    n = feat.shape[0]
    return _global_ranks_core(
        feat, 0, n=n, k1p=k1p, row_block=row_block, n_out=n
    )


def _sparse_v_core(
    feat, rowmax, rank_k1, start, *, n, kh, row_block, val_dtype, n_out
):
    """Pass B body for rows [start, start+n_out): V rows in sparse
    (index, value) form.

    Per row: expansion candidates from `_expansion_sets`, invalid ->
    sentinel n, sort indices ascending, keep first occurrences (dedup —
    equivalent to the dense scatter-max since duplicates carry the same
    weight), gather od at the kept columns, exp(-od), normalize to unit
    sum. Returns (sidx (n_out, E) int32 with sentinel n, sval (n_out, E)).
    `rank_k1` may carry padded junk rows past n — they are never gathered
    (neighbor ids are always < n)."""
    sq = jnp.sum(feat * feat, axis=1)
    rank_kh = rank_k1[:, :kh]

    def blk(rows):
        g_rows = start + rows
        safe = jnp.minimum(g_rows, n - 1)
        od_rows = _dist_rows(feat, sq, safe) / rowmax[safe][:, None]
        e_idx, e_val = _expansion_sets(g_rows, rank_k1, rank_kh, n)
        sorted_idx = lax.sort(jnp.where(e_val, e_idx, n), dimension=-1)
        prev = jnp.pad(sorted_idx[:, :-1], ((0, 0), (1, 0)),
                       constant_values=-1)
        valid = (sorted_idx < n) & (sorted_idx != prev)
        safe_col = jnp.minimum(sorted_idx, n - 1)
        w = jnp.exp(-jnp.take_along_axis(od_rows, safe_col, axis=1))
        w = jnp.where(valid, w, 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        return jnp.where(valid, sorted_idx, n), w.astype(val_dtype)

    sidx, sval = lax.map(blk, _row_blocks(n_out, row_block))
    e = sidx.shape[-1]
    return sidx.reshape(-1, e)[:n_out], sval.reshape(-1, e)[:n_out]


@functools.partial(
    jax.jit, static_argnames=("kh", "row_block", "val_dtype")
)
def _sparse_v(feat, rowmax, rank_k1, kh, row_block, val_dtype):
    """Pass B over all n rows (single-device)."""
    n = feat.shape[0]
    return _sparse_v_core(
        feat, rowmax, rank_k1, 0,
        n=n, kh=kh, row_block=row_block, val_dtype=val_dtype, n_out=n,
    )


def _qe_core(
    sidx, sval, rank_k2, start, *, n, k2, row_block, n_out, seg_len, base,
    n_cols_pad, qe_dtype,
):
    """Pass C body for segment rows [start, start+n_out): query-expanded
    rows as a dense row-quantized matrix (values (n_out, n_cols_pad)
    qe_dtype, per-row fp32 scale, per-row fp32 TRUE sum after
    quantization). Global population row = base + min(start+local,
    seg_len-1): rows past the segment end clamp to the last real row
    (duplicates, sliced/masked away by the caller). `start` may be traced.

    V_qe[i] = mean of the V rows of i's k2 nearest neighbors
    (reference: reranking.py:73-77; self included at rank 0). Built by
    scatter-adding k2 sparse rows; the sentinel column n lands in the
    padding region (or an extra trailing column) and is zeroed. `n` is the
    TRUE population (sidx/rank_k2 may carry padded junk rows past n)."""
    fmax = (1.0 if qe_dtype == jnp.float32
            else float(jnp.finfo(qe_dtype).max))
    blocks = _row_blocks(n_out, row_block)
    b = blocks.shape[1]
    width = max(n_cols_pad, n + 1)

    def blk(rows):
        safe = base + jnp.minimum(start + rows, seg_len - 1)
        nbrs = rank_k2[safe]  # (B, k2)

        def add_j(j, acc):
            nb = nbrs[:, j]
            return acc.at[jnp.arange(b)[:, None], sidx[nb]].add(
                sval[nb].astype(jnp.float32)
            )

        acc = lax.fori_loop(
            0, k2, add_j, jnp.zeros((b, width), jnp.float32)
        )
        acc = acc[:, :n_cols_pad] * (jnp.arange(n_cols_pad) < n) / k2
        scale = jnp.maximum(jnp.max(acc, axis=1), 1e-30) / fmax
        q = (acc / scale[:, None]).astype(qe_dtype)
        qsum = jnp.sum(q.astype(jnp.float32), axis=1) * scale
        return q, scale, qsum

    q, scale, qsum = lax.map(blk, blocks)
    return (
        q.reshape(-1, n_cols_pad)[:n_out],
        scale.reshape(-1)[:n_out],
        qsum.reshape(-1)[:n_out],
    )


@functools.partial(
    jax.jit,
    static_argnames=("k2", "row_block", "n_rows", "n_rows_pad",
                     "row_offset", "n_cols_pad", "qe_dtype"),
)
def _qe_rows_quantized(
    sidx, sval, rank_k2, k2, row_block, n_rows, n_rows_pad, row_offset,
    n_cols_pad, qe_dtype,
):
    """Pass C (single-device): rows [row_offset, row_offset+n_rows) padded
    to n_rows_pad — pre-aligned to the contraction kernel's block size so
    the multi-GB value buffer is never pad-copied downstream."""
    q, scale, qsum = _qe_core(
        sidx, sval, rank_k2, 0,
        n=rank_k2.shape[0], k2=k2, row_block=row_block, n_out=n_rows_pad,
        seg_len=n_rows, base=row_offset, n_cols_pad=n_cols_pad,
        qe_dtype=qe_dtype,
    )
    return q, scale, qsum[:n_rows]


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("num_q", "num_g")
)
def _blend(t, qf, gf, rowmax, qsum, gsum, lambda_value, num_q, num_g):
    """jaccard = 1 - t/(sA+sB-t) blended with the row-normalized original
    distance (reference: reranking.py:95). `t` arrives row/col padded
    from the kernel; the result is sliced to (num_q, num_g)."""
    t_v = t[:num_q, :num_g]
    denom = qsum[:, None] + gsum[None, :] - t_v
    jac = 1.0 - t_v / jnp.maximum(denom, 1e-12)
    cross = jnp.dot(qf, gf.T, precision=_HIGHEST,
                    preferred_element_type=jnp.float32)
    d = (jnp.sum(qf * qf, axis=1)[:, None]
         + jnp.sum(gf * gf, axis=1)[None, :] - 2.0 * cross)
    od_q = d / rowmax[:num_q, None]
    return jac * (1.0 - lambda_value) + od_q * lambda_value


def _streamed_core(
    qf,
    gf,
    k1: int,
    k2: int,
    row_block: int,
    block_a: int,
    block_b: int,
    block_c: int,
    val_dtype,
    qe_dtype,
    use_pallas: bool | None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Passes A-D (everything but the final blend): returns
    (t, rowmax, a_sum, b_sum) where t is the (na_pad, nb_pad) min-sum
    contraction, rowmax the per-row distance max over the full
    population, and a_sum/b_sum the true post-quantization V_qe row sums
    for queries/gallery."""
    num_q, num_g = int(qf.shape[0]), int(gf.shape[0])
    feat = jnp.concatenate([qf, gf], axis=0)
    n = num_q + num_g
    k1 = min(k1, n - 1)
    k2 = max(1, min(k2, n))
    kh = min(int(np.around(k1 / 2)) + 1, n)
    row_block = min(row_block, n)

    rowmax, rank_k1 = _global_ranks(feat, k1 + 1, row_block)
    sidx, sval = _sparse_v(feat, rowmax, rank_k1, kh, row_block, val_dtype)

    rank_k2 = rank_k1[:, :k2]
    n_cols_pad = _round_up(n, min(block_c, _round_up(n, 128)))
    # rows pre-aligned to the kernel blocks so minsum never pad-copies
    # the multi-GB value buffers; padded rows clamp + slice away
    def _align(nr, blk):
        rbe = min(row_block, _round_up(nr, 8))
        pad = _round_up(nr, rbe)
        if nr >= blk:
            pad = _round_up(pad, blk)
        return pad, rbe

    na_pad, qrb = _align(num_q, block_a)
    nb_pad, grb = _align(num_g, block_b)
    a8, a_scale, a_sum = _qe_rows_quantized(
        sidx, sval, rank_k2, k2, qrb, num_q, na_pad, 0, n_cols_pad,
        qe_dtype,
    )
    b8, b_scale, b_sum = _qe_rows_quantized(
        sidx, sval, rank_k2, k2, grb, num_g, nb_pad, num_q, n_cols_pad,
        qe_dtype,
    )
    del sidx, sval

    t = minsum(
        a8, a_scale, b8, b_scale, use_pallas=use_pallas,
        block_a=block_a, block_b=block_b, block_c=block_c,
    )
    del a8, b8
    return t, rowmax, a_sum, b_sum


def _streamed_core_sharded(
    qf,
    gf,
    mesh,
    k1: int,
    k2: int,
    row_block: int,
    block_a: int,
    block_b: int,
    block_c: int,
    val_dtype,
    qe_dtype,
    use_pallas: bool | None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip `_streamed_core`: the same exact-neighborhood pipeline
    with every pass row-sharded over the mesh's "data" axis (SURVEY.md §5:
    the gallery dimension is this workload's long-context analog — shard
    it across chips, keep features in HBM).

    Layout: passes A-C split their row ranges contiguously across devices
    (device d owns rows [d*loc, (d+1)*loc)); the small artifacts (rank
    lists, sparse V, the 1.2GB query-side V_qe) are re-replicated by the
    next pass's in_specs, while the dominant gallery-side V_qe (7.8GB at
    MSMT17) STAYS sharded: each device contracts the full query block
    against only its gallery slice, so per-chip HBM for V_qe + t drops by
    the device count and the min-sum FLOPs distribute linearly. Junk rows
    from per-device padding sit past the true row counts and are sliced
    away here or masked at the metric layer (padding clamps to the last
    real row, and per-device ranges are contiguous, so real rows keep
    their global order).

    Returns the same (t, rowmax, a_sum, b_sum) contract as
    `_streamed_core` (t column-sharded over "data"); per-row math is
    identical to the single-device path, so results match exactly."""
    from tpu_reid.parallel.mesh import shard_map_nocheck
    from jax.sharding import NamedSharding, PartitionSpec as P

    num_q, num_g = int(qf.shape[0]), int(gf.shape[0])
    n = num_q + num_g
    k1 = min(k1, n - 1)
    k2 = max(1, min(k2, n))
    kh = min(int(np.around(k1 / 2)) + 1, n)
    n_dev = mesh.shape["data"]

    n_loc = _round_up(-(-n // n_dev), 8)
    qa_loc = _round_up(-(-num_q // n_dev), 8)
    gb_loc = _round_up(-(-num_g // n_dev), 8)
    rb = min(row_block, n_loc)
    rbq = min(row_block, qa_loc)
    rbg = min(row_block, gb_loc)
    n_cols_pad = _round_up(n, min(block_c, _round_up(n, 128)))

    feat = jax.device_put(
        jnp.concatenate([jnp.asarray(qf, jnp.float32),
                         jnp.asarray(gf, jnp.float32)], axis=0),
        NamedSharding(mesh, P()),
    )

    def smap(fn, in_specs, out_specs):
        return jax.jit(shard_map_nocheck(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        ))

    def ranks_local(feat):
        start = lax.axis_index("data") * n_loc
        return _global_ranks_core(
            feat, start, n=n, k1p=k1 + 1, row_block=rb, n_out=n_loc
        )

    rowmax, rank_k1 = smap(
        ranks_local, (P(),), (P("data"), P("data", None))
    )(feat)

    def sv_local(feat, rowmax, rank_k1):
        start = lax.axis_index("data") * n_loc
        return _sparse_v_core(
            feat, rowmax, rank_k1, start,
            n=n, kh=kh, row_block=rb, val_dtype=val_dtype, n_out=n_loc,
        )

    # rowmax/rank_k1 re-enter replicated (in_specs P()) — XLA inserts the
    # all-gathers; both are tiny next to the V_qe buffers
    sidx, sval = smap(
        sv_local, (P(), P(), P()), (P("data", None), P("data", None))
    )(feat, rowmax, rank_k1)

    rank_k2 = rank_k1[:, :k2]

    def qe_local(loc, seg_len, base, rb_seg):
        def f(sidx, sval, rank_k2):
            start = lax.axis_index("data") * loc
            return _qe_core(
                sidx, sval, rank_k2, start,
                n=n, k2=k2, row_block=rb_seg, n_out=loc, seg_len=seg_len,
                base=base, n_cols_pad=n_cols_pad, qe_dtype=qe_dtype,
            )
        return f

    in3 = (P(), P(), P())
    out3 = (P("data", None), P("data"), P("data"))
    a8, a_scale, a_qsum = smap(
        qe_local(qa_loc, num_q, 0, rbq), in3, out3
    )(sidx, sval, rank_k2)
    b8, b_scale, b_qsum = smap(
        qe_local(gb_loc, num_g, num_q, rbg), in3, out3
    )(sidx, sval, rank_k2)
    del sidx, sval

    def contract_local(a8, a_scale, b8, b_scale):
        # a (query) side replicated, b (gallery) side local: each device
        # produces the t columns of its own gallery slice
        return minsum(
            a8, a_scale, b8, b_scale, use_pallas=use_pallas,
            block_a=block_a, block_b=block_b, block_c=block_c,
        )

    t = smap(
        contract_local,
        (P(), P(), P("data", None), P("data")),
        P(None, "data"),
    )(a8, a_scale, b8, b_scale)
    del a8, b8
    return t, rowmax[:n], a_qsum[:num_q], b_qsum[:num_g]


def _core_dispatch(qf, gf, mesh, *args):
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        return _streamed_core_sharded(qf, gf, mesh, *args)
    return _streamed_core(qf, gf, *args)


def k_reciprocal_rerank_streamed(
    qf,
    gf,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    row_block: int = 256,
    block_a: int = 1024,
    block_b: int = 1024,
    block_c: int = 2048,
    val_dtype=jnp.bfloat16,
    qe_dtype=jnp.float8_e4m3fn,
    use_pallas: bool | None = None,
    mesh=None,
) -> jax.Array:
    """(Q, G) re-ranked distances with exact global k-reciprocal
    neighborhoods at populations far beyond the dense path's HBM limit.

    With `mesh` (a jax.sharding.Mesh with a "data" axis of size > 1) every
    pass shards its rows across devices and the gallery-side V_qe + t stay
    sharded — same exact results, per-chip memory and min-sum FLOPs divided
    by the device count (`_streamed_core_sharded`).

    Peak HBM at MSMT17 scale (n=93,820): ~13GB — quantized V_qe for
    queries (1.2GB) + gallery (7.8GB) + the fp32 output (4.1GB padded);
    the sparse V (~0.8GB) is freed before the contraction. Pass
    val_dtype=qe_dtype=jnp.float32 for a (memory-hungry) quantization-free
    run — used by the parity tests against `k_reciprocal_rerank`.

    NOTE: the returned dense (Q, G) matrix plus the blend transients add
    several more GB on top of the pipeline peak; when the caller only
    needs CMC/mAP, use `k_reciprocal_rerank_streamed_rows` +
    `metrics.cmc_map_from_rows` instead, which never materializes a
    second full-size buffer (this is what Evaluator's streamed mode does).
    """
    qf = jnp.asarray(qf, jnp.float32)
    gf = jnp.asarray(gf, jnp.float32)
    num_q, num_g = int(qf.shape[0]), int(gf.shape[0])
    t, rowmax, a_sum, b_sum = _core_dispatch(
        qf, gf, mesh, k1, k2, row_block, block_a, block_b, block_c,
        val_dtype, qe_dtype, use_pallas,
    )
    return _blend(
        t, qf, gf, rowmax, a_sum, b_sum,
        jnp.float32(lambda_value), num_q, num_g,
    )


@functools.partial(
    jax.jit, static_argnames=("q_chunk", "num_g")
)
def _blend_chunk(
    t, qf_pad, gf, g_sq, rowmax_q_pad, a_sum_pad, b_sum,
    lambda_value, start, q_chunk, num_g,
):
    """`_blend` for rows [start, start+q_chunk): same math, one chunk of
    output — the only full-size buffer it touches is `t` (read-only)."""
    t_rows = lax.dynamic_slice_in_dim(t, start, q_chunk, axis=0)[:, :num_g]
    qfr = lax.dynamic_slice_in_dim(qf_pad, start, q_chunk, axis=0)
    a_sum_r = lax.dynamic_slice_in_dim(a_sum_pad, start, q_chunk, axis=0)
    rowmax_r = lax.dynamic_slice_in_dim(rowmax_q_pad, start, q_chunk, axis=0)
    denom = a_sum_r[:, None] + b_sum[None, :] - t_rows
    jac = 1.0 - t_rows / jnp.maximum(denom, 1e-12)
    cross = jnp.dot(qfr, gf.T, precision=_HIGHEST,
                    preferred_element_type=jnp.float32)
    d = jnp.sum(qfr * qfr, axis=1)[:, None] + g_sq[None, :] - 2.0 * cross
    od_q = d / rowmax_r[:, None]
    return jac * (1.0 - lambda_value) + od_q * lambda_value


def k_reciprocal_rerank_streamed_rows(
    qf,
    gf,
    k1: int = 50,
    k2: int = 15,
    lambda_value: float = 0.3,
    q_chunk: int = 1024,
    mesh=None,
    **kw,
):
    """Row-provider variant: returns ``(row_fn, q_chunk)`` where
    ``row_fn(start)`` yields the fp32 ``(q_chunk, num_g)`` block of
    re-ranked distances for queries [start, start+q_chunk) — start must
    walk multiples of q_chunk as `metrics.cmc_map_from_rows` does.

    Exists because at MSMT17 scale the pipeline's working set (quantized
    V_qe + the min-sum output t) already sits at ~13GB; `_blend`'s dense
    (Q, G) result + fused transients pushed the real-chip evaluation over
    the 16GB HBM limit (RESOURCE_EXHAUSTED). Here the blend runs per
    query-chunk (one ~0.3GB block at a time) and the metric consumes each
    block immediately, so the peak stays at the pipeline's own ~13GB.

    Rows past num_q (tail padding) are duplicates of the last real query
    row; the metric layer masks them out via pid -1.
    """
    qf = jnp.asarray(qf, jnp.float32)
    gf = jnp.asarray(gf, jnp.float32)
    num_q, num_g = int(qf.shape[0]), int(gf.shape[0])
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        # match the sharded core's per-device query-row padding so the
        # chunk walk never triggers the multi-GB pad-copy of t below
        q_chunk = _round_up(-(-num_q // mesh.shape["data"]), 8)
    q_chunk = min(q_chunk, num_q)
    t, rowmax, a_sum, b_sum = _core_dispatch(
        qf, gf, mesh, k1, k2,
        kw.pop("row_block", 256), kw.pop("block_a", 1024),
        kw.pop("block_b", 1024), kw.pop("block_c", 2048),
        kw.pop("val_dtype", jnp.bfloat16),
        kw.pop("qe_dtype", jnp.float8_e4m3fn),
        kw.pop("use_pallas", None),
    )
    assert not kw, f"unknown kwargs: {kw}"
    na_pad = int(t.shape[0])
    need = _round_up(num_q, q_chunk)
    if need > na_pad:
        # only reachable with a custom q_chunk that doesn't divide the
        # kernel row padding — small populations in practice, so the pad
        # copy is cheap; the default q_chunk never triggers it
        t = jnp.pad(t, ((0, need - na_pad), (0, 0)))
        na_pad = need
    qf_pad = jnp.pad(qf, ((0, na_pad - num_q), (0, 0)))
    a_sum_pad = jnp.pad(a_sum, (0, na_pad - num_q), constant_values=1.0)
    rowmax_q_pad = jnp.pad(
        rowmax[:num_q], (0, na_pad - num_q), constant_values=1.0
    )
    g_sq = jnp.sum(gf * gf, axis=1)
    lam = jnp.float32(lambda_value)

    def row_fn(start: int) -> jax.Array:
        return _blend_chunk(
            t, qf_pad, gf, g_sq, rowmax_q_pad, a_sum_pad, b_sum,
            lam, start, q_chunk, num_g,
        )

    return row_fn, q_chunk
