from tpu_reid.weights.convert import (
    convert_clip,
    infer_config,
    load_state_dict,
    merge_pretrained,
    overlay_clip_reid,
)
from tpu_reid.weights.fetch import download

__all__ = [
    "convert_clip",
    "infer_config",
    "load_state_dict",
    "merge_pretrained",
    "overlay_clip_reid",
    "download",
]
