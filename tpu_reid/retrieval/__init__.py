from tpu_reid.retrieval.distance import euclidean_distmat, cosine_distmat, l2_normalize
from tpu_reid.retrieval.metrics import cmc_map, Evaluator
from tpu_reid.retrieval.rerank import k_reciprocal_rerank, k_reciprocal_rerank_sharded
from tpu_reid.retrieval.topk import blockwise_topk, retrieve

__all__ = [
    "euclidean_distmat",
    "cosine_distmat",
    "l2_normalize",
    "cmc_map",
    "Evaluator",
    "k_reciprocal_rerank",
    "k_reciprocal_rerank_sharded",
    "blockwise_topk",
    "retrieve",
]
