"""Typed configuration for the whole framework.

The reference drives everything through per-script argparse flags plus a
module-global `params` closed over by classes (an anti-pattern noted in
SURVEY.md §5). Here every component takes an explicit frozen dataclass, so
configs are hashable (usable as jit static args) and self-documenting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PromptDesign:
    """Deep vision-language prompting design (IVLP / MaPLe / PromptSRC).

    Mirrors the reference's `design_details` dict
    (reference: prompt_learning.py:676-704, maple.py:535-541):
      * trainer "IVLP": independent learned prompt tokens per layer on both
        towers, for layers 1..depth-1 (layer 0 prompts are the shallow ones
        appended/embedded at the input).
      * trainer "MaPLe": text-side deep prompts projected to the vision side.
      * vision_depth/language_depth == 0 disables deep prompting (CoOp path).
    """

    trainer: str = "CoOp"  # CoOp | IVLP | MaPLe | VPT
    vision_depth: int = 0
    vision_ctx: int = 0
    language_depth: int = 0
    language_ctx: int = 0
    maple_length: int = 0

    @property
    def has_vision_prompts(self) -> bool:
        return self.vision_depth > 0 and self.vision_ctx > 0

    @property
    def has_language_prompts(self) -> bool:
        return self.language_depth > 0 and self.language_ctx > 0


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP vision tower (ViT) config.

    h_grid/w_grid are the *post-conv* patch-grid dims; with the reference's
    overlapping patch embed (stride < patch) they are
    (H - patch)//stride + 1 etc. — e.g. 256x128 @ patch16/stride12 -> 21x11
    (reference: coop.py:190-195, prompt_learning.py:700).
    """

    layers: int = 12
    width: int = 768
    patch_size: int = 16
    stride: int = 16
    h_grid: int = 14
    w_grid: int = 14
    output_dim: int = 512
    design: PromptDesign = PromptDesign()
    n_heads: Optional[int] = None  # default: width // 64 (CLIP convention)

    @property
    def heads(self) -> int:
        if self.n_heads is not None:
            return self.n_heads
        return max(1, self.width // 64)

    @property
    def seq_len(self) -> int:
        n = self.h_grid * self.w_grid + 1
        if self.design.has_vision_prompts:
            n += self.design.vision_ctx
        return n

    @staticmethod
    def grid_for(image_hw: Tuple[int, int], patch: int, stride: int) -> Tuple[int, int]:
        h, w = image_hw
        return (h - patch) // stride + 1, (w - patch) // stride + 1


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """CLIP text tower config (causal transformer, 77-token context)."""

    layers: int = 12
    width: int = 512
    heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    output_dim: int = 512
    design: PromptDesign = PromptDesign()


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    """ModifiedResNet (RN50-style) vision tower config.

    Reference: custom_clip_model.py:186-242 — 3-layer conv stem, layer4 with
    stride 1, attention-pool head over an h_grid x w_grid feature map.
    """

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    h_grid: int = 7
    w_grid: int = 7
    # ReID variant runs layer4 at stride 1 (reference: custom_clip_model.py:214)
    # so the final map is input/16; standard CLIP RN is stride 2 (input/32).
    layer4_stride: int = 1

    @property
    def total_stride(self) -> int:
        return 16 * self.layer4_stride

    @property
    def heads(self) -> int:
        return self.width * 32 // 64

    @staticmethod
    def grid_for(
        image_hw: Tuple[int, int], layer4_stride: int = 1
    ) -> Tuple[int, int]:
        s = 16 * layer4_stride
        return image_hw[0] // s, image_hw[1] // s


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: Optional[VisionConfig] = None
    resnet: Optional[ResNetConfig] = None
    text: TextConfig = TextConfig()
    embed_dim: int = 512

    def __post_init__(self):
        assert (self.vision is None) != (self.resnet is None), (
            "exactly one of vision (ViT) / resnet towers must be set"
        )


# Canonical CLIP ViT-B/16 at the reference's ReID resolution 256x128, stride
# 12 overlapping patches (reference: prompt_learning.py:700 — h//12).
def vit_b16_reid(
    image_hw: Tuple[int, int] = (256, 128),
    stride: int = 12,
    design: PromptDesign = PromptDesign(),
) -> CLIPConfig:
    hg, wg = VisionConfig.grid_for(image_hw, 16, stride)
    return CLIPConfig(
        vision=VisionConfig(
            layers=12, width=768, patch_size=16, stride=stride,
            h_grid=hg, w_grid=wg, output_dim=512, design=design,
        ),
        text=TextConfig(design=design),
        embed_dim=512,
    )
