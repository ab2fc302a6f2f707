from tpu_reid.models import layers, vit, text, clip_model

__all__ = ["layers", "vit", "text", "clip_model"]
