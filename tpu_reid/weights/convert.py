"""PyTorch checkpoint → JAX pytree converters.

Consumes the four external checkpoint formats the reference uses
(SURVEY.md §5):
  1. OpenAI CLIP JIT archives (ViT-B/16, RN50, ...) — torch.jit archives
     whose state_dict carries the full CLIP (reference downloads them via
     clip_custom.py:36-65 and rebuilds with coop.py:441-490),
  2. plain `.pth` training checkpoints (CLIP-ReID style, keys prefixed
     `image_encoder.` / `text_encoder.` — reference: utils.py:211-217,
     zero_shot_learning.py:28-35),
  3. IVLP ImageNet-pretrained VPT weights (`{"state_dict": ...}` tar,
     reference: prompt_learning.py:721-731),
  4. HF-style `.bin` state dicts (MetaCLIP teacher,
     reference: prompt_learning.py:695).

Architecture is inferred from state-dict shapes exactly like the reference
factories (coop.py:441-466); the square pretrained positional grid is
bicubic-resized to the rectangular ReID grid at load time
(models/clip_model.resize_pos_embed).

torch is used ONLY here, on host, for unpickling; everything downstream is
numpy/JAX.
"""

from __future__ import annotations

import math
import re
from typing import Dict, Optional, Tuple

import numpy as np

from tpu_reid.configs import (
    CLIPConfig,
    PromptDesign,
    ResNetConfig,
    TextConfig,
    VisionConfig,
)
from tpu_reid.models.clip_model import resize_pos_embed

Array = np.ndarray
StateDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def load_state_dict(path: str) -> StateDict:
    """Load any of the supported torch formats into {name: float32 ndarray}."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        elif isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict
        ):
            obj = obj["model"]
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().float().cpu().numpy()
    return out


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    """Keep keys under `prefix`, with the prefix removed (exact string strip,
    not the reference's buggy `lstrip` char-set
    — prompt_learning_multitask_hard_sharing_ivlp.py:688)."""
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def drop_prefix(sd: StateDict, prefix: str = "module.") -> StateDict:
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


# ---------------------------------------------------------------------------
# shape-based architecture inference (behavioral parity: coop.py:441-466)
# ---------------------------------------------------------------------------


def infer_config(
    sd: StateDict,
    image_hw: Tuple[int, int] = (224, 224),
    stride: Optional[int] = None,
    design: PromptDesign = PromptDesign(),
) -> CLIPConfig:
    is_vit = "visual.proj" in sd
    text = TextConfig(
        layers=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks.")
            }
        ),
        width=sd["ln_final.weight"].shape[0],
        heads=max(1, sd["ln_final.weight"].shape[0] // 64),
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        output_dim=sd["text_projection"].shape[1],
        design=design,
    )
    if is_vit:
        width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        s = stride or patch
        hg, wg = VisionConfig.grid_for(image_hw, patch, s)
        vision = VisionConfig(
            layers=len(
                {
                    k.split(".")[3]
                    for k in sd
                    if k.startswith("visual.transformer.resblocks.")
                }
            ),
            width=width,
            patch_size=patch,
            stride=s,
            h_grid=hg,
            w_grid=wg,
            output_dim=sd["visual.proj"].shape[1],
            design=design,
        )
        return CLIPConfig(vision=vision, text=text,
                          embed_dim=sd["text_projection"].shape[1])
    counts = []
    for b in range(1, 5):
        ids = {
            int(k.split(".")[2])
            for k in sd
            if re.match(rf"visual\.layer{b}\.\d+\.conv1\.weight", k)
        }
        counts.append(len(ids))
    hg, wg = ResNetConfig.grid_for(image_hw, layer4_stride=1)
    resnet = ResNetConfig(
        layers=tuple(counts),
        width=sd["visual.conv1.weight"].shape[0] * 2,
        output_dim=sd["visual.attnpool.c_proj.weight"].shape[0],
        h_grid=hg,
        w_grid=wg,
    )
    return CLIPConfig(resnet=resnet, text=text,
                      embed_dim=sd["text_projection"].shape[1])


# ---------------------------------------------------------------------------
# tower converters
# ---------------------------------------------------------------------------


def _linear(sd: StateDict, name: str) -> dict:
    p = {"w": sd[f"{name}.weight"].T.copy()}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].copy()
    return p


def _ln(sd: StateDict, name: str) -> dict:
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _bn(sd: StateDict, name: str) -> dict:
    return {
        "scale": sd[f"{name}.weight"].copy(),
        "bias": sd[f"{name}.bias"].copy(),
        "mean": sd[f"{name}.running_mean"].copy(),
        "var": sd[f"{name}.running_var"].copy(),
    }


def _block(sd: StateDict, pre: str) -> dict:
    return {
        "attn": {
            "in_proj": {
                "w": sd[f"{pre}.attn.in_proj_weight"].T.copy(),
                "b": sd[f"{pre}.attn.in_proj_bias"].copy(),
            },
            "out_proj": _linear(sd, f"{pre}.attn.out_proj"),
        },
        "ln_1": _ln(sd, f"{pre}.ln_1"),
        "mlp": {
            "c_fc": _linear(sd, f"{pre}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{pre}.mlp.c_proj"),
        },
        "ln_2": _ln(sd, f"{pre}.ln_2"),
    }


def _stack_blocks(sd: StateDict, prefix: str, n_layers: int) -> dict:
    import jax

    blocks = [_block(sd, f"{prefix}.{i}") for i in range(n_layers)]
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def convert_vit(sd: StateDict, cfg: VisionConfig) -> dict:
    """`visual.*`-keyed CLIP ViT tower -> models.vit pytree. Conv weights go
    OIHW -> HWIO; the positional grid is resized to (h_grid, w_grid)."""
    pos = sd["visual.positional_embedding"]
    n_tok = cfg.h_grid * cfg.w_grid + 1
    if pos.shape[0] != n_tok:
        pos = resize_pos_embed(pos, cfg.h_grid, cfg.w_grid)
    params = {
        "conv": {"w": sd["visual.conv1.weight"].transpose(2, 3, 1, 0).copy()},
        "class_embedding": sd["visual.class_embedding"].copy(),
        "positional_embedding": pos,
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack_blocks(sd, "visual.transformer.resblocks", cfg.layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"].copy(),
    }
    # learned VPT tokens, when the checkpoint has them (IVLP pretrained)
    if "visual.VPT" in sd:
        params["vpt_shallow"] = sd["visual.VPT"].copy()
    deep = sorted(
        (k for k in sd if re.match(r"visual\.transformer\.resblocks\.\d+\.VPT_shallow", k)),
        key=lambda k: int(k.split(".")[3]),
    )
    if deep and cfg.design.has_vision_prompts:
        layers = np.zeros(
            (cfg.layers, cfg.design.vision_ctx, cfg.width), np.float32
        )
        for k in deep:
            layers[int(k.split(".")[3])] = sd[k]
        params["vpt_deep"] = layers
    return params


def convert_text(sd: StateDict, cfg: TextConfig) -> dict:
    params = {
        "token_embedding": sd["token_embedding.weight"].copy(),
        "positional_embedding": sd["positional_embedding"].copy(),
        "blocks": _stack_blocks(sd, "transformer.resblocks", cfg.layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"].copy(),
    }
    deep = sorted(
        (k for k in sd if re.match(r"transformer\.resblocks\.\d+\.VPT_shallow", k)),
        key=lambda k: int(k.split(".")[2]),
    )
    if deep and cfg.design.has_language_prompts:
        layers = np.zeros(
            (cfg.layers, cfg.design.language_ctx, cfg.width), np.float32
        )
        for k in deep:
            layers[int(k.split(".")[2])] = sd[k]
        params["vpt_deep"] = layers
    return params


def convert_resnet(sd: StateDict, cfg: ResNetConfig) -> dict:
    def conv(name):
        return {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0).copy()}

    params = {
        "conv1": conv("visual.conv1"), "bn1": _bn(sd, "visual.bn1"),
        "conv2": conv("visual.conv2"), "bn2": _bn(sd, "visual.bn2"),
        "conv3": conv("visual.conv3"), "bn3": _bn(sd, "visual.bn3"),
    }
    for li, blocks in enumerate(cfg.layers):
        layer = []
        for j in range(blocks):
            pre = f"visual.layer{li + 1}.{j}"
            blk = {
                "conv1": conv(f"{pre}.conv1"), "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2"), "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3"), "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.1.weight" in sd:
                # CLIP downsample = [avgpool, conv 1x1, bn]
                blk["down_conv"] = conv(f"{pre}.downsample.1")
                blk["down_bn"] = _bn(sd, f"{pre}.downsample.2")
            elif f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{pre}.downsample.0")
                blk["down_bn"] = _bn(sd, f"{pre}.downsample.1")
            layer.append(blk)
        params[f"layer{li + 1}"] = layer

    n_tok = cfg.h_grid * cfg.w_grid
    pos = sd["visual.attnpool.positional_embedding"]
    if pos.shape[0] != n_tok + 1:
        pos = resize_pos_embed(pos, cfg.h_grid, cfg.w_grid)
    params["attnpool"] = {
        "positional_embedding": pos,
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    return params


def convert_clip(
    sd: StateDict,
    image_hw: Tuple[int, int] = (224, 224),
    stride: Optional[int] = None,
    design: PromptDesign = PromptDesign(),
) -> Tuple[CLIPConfig, dict]:
    """Full OpenAI-format CLIP state dict -> (config, params pytree)."""
    cfg = infer_config(sd, image_hw=image_hw, stride=stride, design=design)
    visual = (
        convert_vit(sd, cfg.vision)
        if cfg.vision is not None
        else convert_resnet(sd, cfg.resnet)
    )
    params = {
        "visual": visual,
        "text": convert_text(sd, cfg.text),
        "logit_scale": np.asarray(
            sd.get("logit_scale", math.log(1 / 0.07)), np.float32
        ).reshape(()),
    }
    return cfg, params


def overlay_clip_reid(base_sd: StateDict, reid_sd: StateDict) -> StateDict:
    """Overlay a CLIP-ReID training checkpoint onto an OpenAI CLIP state
    dict: `image_encoder.*` keys remap onto `visual.*`, `text_encoder.*`
    onto the top-level text keys (reference: utils.py:211-217,
    zero_shot_learning.py:28-35). Convert the result with convert_clip."""
    out = dict(base_sd)
    for k, v in reid_sd.items():
        if k.startswith("image_encoder."):
            out["visual." + k[len("image_encoder."):]] = v
        elif k.startswith("text_encoder."):
            out[k[len("text_encoder."):]] = v
    return out


def merge_pretrained(params: dict, updates: dict, path: str = "") -> dict:
    """Shape-tolerant recursive merge: leaves in `updates` replace leaves in
    `params` when shapes match; mismatches are skipped with a warning
    (reference behavior: utils.py:86-108)."""
    out = {}
    for k, v in params.items():
        if k not in updates:
            out[k] = v
        elif isinstance(v, dict):
            out[k] = merge_pretrained(v, updates[k], f"{path}{k}.")
        else:
            u = updates[k]
            if tuple(np.shape(u)) == tuple(np.shape(v)):
                out[k] = u
            else:
                print(
                    f"[weights] skip {path}{k}: checkpoint {np.shape(u)} "
                    f"vs model {np.shape(v)}"
                )
                out[k] = v
    return out
