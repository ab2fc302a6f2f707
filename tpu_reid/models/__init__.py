from tpu_reid.models import (
    clip_model,
    heads,
    layers,
    maple_prompts,
    prompts,
    reid_clip,
    resnet,
    text,
    tokenizer,
    vit,
)

__all__ = [
    "clip_model",
    "heads",
    "layers",
    "maple_prompts",
    "prompts",
    "reid_clip",
    "resnet",
    "text",
    "tokenizer",
    "vit",
]
