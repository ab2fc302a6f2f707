"""Independent host-numpy implementations of the published ReID protocols.

These are straight-line transcriptions of the *published algorithms*
(Market-1501 CMC/mAP protocol; Zhong et al. CVPR'17 k-reciprocal
re-ranking), written as per-query loops. They exist purely as golden
oracles for the vectorized on-device implementations in
tpu_reid/retrieval/. They intentionally mirror the reference semantics
(reference: evaluate.py:29-88, reranking.py:29-100) without sharing code.
"""

from __future__ import annotations

import numpy as np


def golden_cmc_map(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)
    order = np.argsort(distmat, axis=1)

    cmc_rows, aps = [], []
    for qi in range(num_q):
        row = order[qi]
        remove = (g_pids[row] == q_pids[qi]) & (g_camids[row] == q_camids[qi])
        kept = ~remove
        raw = (g_pids[row][kept] == q_pids[qi]).astype(np.int32)
        if not raw.any():
            continue
        hits = raw.cumsum()
        hits[hits > 1] = 1
        cmc_rows.append(hits[:max_rank])
        ranks = raw.cumsum()
        precision = ranks / np.arange(1, len(raw) + 1)
        aps.append((precision * raw).sum() / raw.sum())

    cmc = np.stack(cmc_rows).astype(np.float64).mean(axis=0)
    return cmc, float(np.mean(aps))


def golden_minp(distmat, q_pids, g_pids, q_camids, g_camids):
    """mINP (Ye et al., "Deep Learning for Person Re-Identification: A
    Survey and Outlook", TPAMI'21): per valid query,
    INP = num_positives / rank of the hardest (last) positive among kept
    gallery entries; mINP = mean over valid queries."""
    num_q = distmat.shape[0]
    order = np.argsort(distmat, axis=1)
    inps = []
    for qi in range(num_q):
        row = order[qi]
        remove = (g_pids[row] == q_pids[qi]) & (g_camids[row] == q_camids[qi])
        kept = ~remove
        raw = (g_pids[row][kept] == q_pids[qi]).astype(np.int32)
        if not raw.any():
            continue
        hardest_rank = np.max(np.nonzero(raw)[0]) + 1  # 1-indexed kept rank
        inps.append(raw.sum() / hardest_rank)
    return float(np.mean(inps))


def golden_k_reciprocal(qf, gf, k1, k2, lambda_value):
    """Per-row-loop k-reciprocal re-ranking (Zhong et al. CVPR'17)."""
    qf = np.asarray(qf, np.float32)
    gf = np.asarray(gf, np.float32)
    num_q = qf.shape[0]
    feat = np.concatenate([qf, gf], axis=0)
    n = feat.shape[0]

    sq = (feat**2).sum(axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
    od = (dist / dist.max(axis=0, keepdims=True)).T
    rank = np.argsort(od, axis=1).astype(np.int32)

    def reciprocal(i, k):
        fwd = rank[i, : k + 1]
        back = rank[fwd, : k + 1]
        return fwd[np.where(back == i)[0]]

    kh = int(np.around(k1 / 2))
    v = np.zeros((n, n), np.float32)
    for i in range(n):
        r_i = reciprocal(i, k1)
        expansion = list(r_i)
        for cand in r_i:
            r_half = reciprocal(cand, kh)
            if len(np.intersect1d(r_half, r_i)) > (2.0 / 3.0) * len(r_half):
                expansion.extend(r_half)
        expansion = np.unique(np.asarray(expansion))
        w = np.exp(-od[i, expansion])
        v[i, expansion] = w / w.sum()

    if k2 != 1:
        v = np.stack([v[rank[i, :k2]].mean(axis=0) for i in range(n)])

    jaccard = np.zeros((num_q, n), np.float32)
    for i in range(num_q):
        t = np.minimum(v[i][None, :], v).sum(axis=1)
        jaccard[i] = 1.0 - t / (2.0 - t)

    final = jaccard * (1 - lambda_value) + od[:num_q] * lambda_value
    return final[:, num_q:]
