from tpu_reid.parallel.extract import extract_embeddings, make_extractor
from tpu_reid.parallel.multihost import (
    extract_embeddings_multihost,
    host_slice_records,
    init_distributed,
    replicate_multihost,
    shard_batch_multihost,
)
from tpu_reid.parallel.prefetch import device_prefetch
from tpu_reid.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
    shard_map_nocheck,
)

__all__ = [
    "device_prefetch",
    "extract_embeddings",
    "extract_embeddings_multihost",
    "host_slice_records",
    "init_distributed",
    "make_extractor",
    "replicate_multihost",
    "shard_batch_multihost",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "shard_map_nocheck",
]
