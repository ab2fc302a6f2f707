from tpu_reid.data.attributes import (
    get_prompts,
    get_prompts_augmented,
    get_prompts_simple,
)
from tpu_reid.data.datasets import ReidDataset, get_dataset, merge_datasets
from tpu_reid.data.loader import BatchLoader
from tpu_reid.data.sampler import PKSampler
from tpu_reid.data.transforms import DevicePreprocess

__all__ = [
    "get_prompts",
    "get_prompts_augmented",
    "get_prompts_simple",
    "ReidDataset",
    "get_dataset",
    "merge_datasets",
    "BatchLoader",
    "PKSampler",
    "DevicePreprocess",
]
