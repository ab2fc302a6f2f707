from tpu_reid.retrieval.distance import euclidean_distmat, cosine_distmat, l2_normalize
from tpu_reid.retrieval.metrics import cmc_map, cmc_map_from_rows, Evaluator
from tpu_reid.retrieval.rerank import k_reciprocal_rerank, k_reciprocal_rerank_sharded
from tpu_reid.retrieval.rerank_stream import (
    k_reciprocal_rerank_streamed,
    k_reciprocal_rerank_streamed_rows,
)
from tpu_reid.retrieval.topk import blockwise_topk, retrieve

__all__ = [
    "euclidean_distmat",
    "cosine_distmat",
    "l2_normalize",
    "cmc_map",
    "cmc_map_from_rows",
    "Evaluator",
    "k_reciprocal_rerank",
    "k_reciprocal_rerank_sharded",
    "k_reciprocal_rerank_streamed",
    "k_reciprocal_rerank_streamed_rows",
    "blockwise_topk",
    "retrieve",
]
