"""Independent torch-functional oracle for CLIP tower math.

Used by tests to verify that the JAX towers + weight converter reproduce
the published CLIP architecture bit-for-bit (to fp32 tolerance) from an
OpenAI-format state dict. Written directly against torch.nn.functional —
NOT ported from the reference repo — so it is an independent check of the
same public spec.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k])).float()


def quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


def _block(sd, pre, x, n_heads, attn_mask=None):
    """Pre-norm CLIP block on (L, N, D) sequences."""
    h = F.layer_norm(
        x, (x.shape[-1],), _t(sd, f"{pre}.ln_1.weight"), _t(sd, f"{pre}.ln_1.bias")
    )
    attn_out, _ = F.multi_head_attention_forward(
        h, h, h,
        embed_dim_to_check=x.shape[-1],
        num_heads=n_heads,
        in_proj_weight=_t(sd, f"{pre}.attn.in_proj_weight"),
        in_proj_bias=_t(sd, f"{pre}.attn.in_proj_bias"),
        bias_k=None, bias_v=None,
        add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=_t(sd, f"{pre}.attn.out_proj.weight"),
        out_proj_bias=_t(sd, f"{pre}.attn.out_proj.bias"),
        need_weights=False,
        attn_mask=attn_mask,
    )
    x = x + attn_out
    h = F.layer_norm(
        x, (x.shape[-1],), _t(sd, f"{pre}.ln_2.weight"), _t(sd, f"{pre}.ln_2.bias")
    )
    h = quick_gelu(h @ _t(sd, f"{pre}.mlp.c_fc.weight").T + _t(sd, f"{pre}.mlp.c_fc.bias"))
    h = h @ _t(sd, f"{pre}.mlp.c_proj.weight").T + _t(sd, f"{pre}.mlp.c_proj.bias")
    return x + h


def vit_forward(sd, images_nchw: np.ndarray, stride: int, n_layers: int,
                n_heads: int):
    """OpenAI-format ViT forward. Returns (x11, x12_post_ln, xproj) CLS rows
    plus the full projected sequence, all as numpy."""
    x = torch.from_numpy(images_nchw).float()
    w = _t(sd, "visual.conv1.weight")
    x = F.conv2d(x, w, stride=stride)
    b, d = x.shape[0], x.shape[1]
    x = x.reshape(b, d, -1).permute(0, 2, 1)  # (B, S, D)
    cls = _t(sd, "visual.class_embedding").reshape(1, 1, d).expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + _t(sd, "visual.positional_embedding")
    x = F.layer_norm(
        x, (d,), _t(sd, "visual.ln_pre.weight"), _t(sd, "visual.ln_pre.bias")
    )
    x = x.permute(1, 0, 2)  # LND
    x11 = None
    for i in range(n_layers):
        if i == n_layers - 1:
            x11 = x.permute(1, 0, 2).clone()
        x = _block(sd, f"visual.transformer.resblocks.{i}", x, n_heads)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(
        x, (d,), _t(sd, "visual.ln_post.weight"), _t(sd, "visual.ln_post.bias")
    )
    xproj = x @ _t(sd, "visual.proj")
    return x11.numpy(), x.numpy(), xproj.numpy()


def text_forward(sd, tokens: np.ndarray, n_layers: int, n_heads: int):
    """OpenAI-format causal text encoder forward -> (B, E) EOT features."""
    tok = torch.from_numpy(tokens).long()
    x = _t(sd, "token_embedding.weight")[tok]
    x = x + _t(sd, "positional_embedding")
    n = x.shape[1]
    mask = torch.full((n, n), float("-inf")).triu(1)
    x = x.permute(1, 0, 2)
    for i in range(n_layers):
        x = _block(sd, f"transformer.resblocks.{i}", x, n_heads, attn_mask=mask)
    x = x.permute(1, 0, 2)
    x = F.layer_norm(
        x, (x.shape[-1],), _t(sd, "ln_final.weight"), _t(sd, "ln_final.bias")
    )
    eot = tok.argmax(dim=-1)
    feats = x[torch.arange(x.shape[0]), eot]
    return (feats @ _t(sd, "text_projection")).numpy()


def make_clip_state_dict(
    rng: np.random.RandomState,
    *,
    vision_width=64,
    vision_layers=3,
    patch=8,
    grid=4,
    text_width=128,
    text_layers=2,
    vocab=100,
    context=16,
    embed_dim=24,
) -> dict:
    """Random OpenAI-format CLIP ViT state dict (numpy) for tests."""
    sd = {}

    def blocks(prefix, width, layers):
        for i in range(layers):
            pre = f"{prefix}.{i}"
            sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * width, width) * 0.05
            sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * width) * 0.01
            sd[f"{pre}.attn.out_proj.weight"] = rng.randn(width, width) * 0.05
            sd[f"{pre}.attn.out_proj.bias"] = rng.randn(width) * 0.01
            sd[f"{pre}.ln_1.weight"] = 1 + rng.randn(width) * 0.01
            sd[f"{pre}.ln_1.bias"] = rng.randn(width) * 0.01
            sd[f"{pre}.ln_2.weight"] = 1 + rng.randn(width) * 0.01
            sd[f"{pre}.ln_2.bias"] = rng.randn(width) * 0.01
            sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(4 * width, width) * 0.05
            sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(4 * width) * 0.01
            sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(width, 4 * width) * 0.05
            sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(width) * 0.01

    sd["visual.conv1.weight"] = rng.randn(vision_width, 3, patch, patch) * 0.05
    sd["visual.class_embedding"] = rng.randn(vision_width) * 0.05
    sd["visual.positional_embedding"] = (
        rng.randn(grid * grid + 1, vision_width) * 0.05
    )
    sd["visual.ln_pre.weight"] = 1 + rng.randn(vision_width) * 0.01
    sd["visual.ln_pre.bias"] = rng.randn(vision_width) * 0.01
    blocks("visual.transformer.resblocks", vision_width, vision_layers)
    sd["visual.ln_post.weight"] = 1 + rng.randn(vision_width) * 0.01
    sd["visual.ln_post.bias"] = rng.randn(vision_width) * 0.01
    sd["visual.proj"] = rng.randn(vision_width, embed_dim) * 0.05

    sd["token_embedding.weight"] = rng.randn(vocab, text_width) * 0.02
    sd["positional_embedding"] = rng.randn(context, text_width) * 0.01
    blocks("transformer.resblocks", text_width, text_layers)
    sd["ln_final.weight"] = 1 + rng.randn(text_width) * 0.01
    sd["ln_final.bias"] = rng.randn(text_width) * 0.01
    sd["text_projection"] = rng.randn(text_width, embed_dim) * 0.05
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07))

    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def make_rn50_state_dict(
    rng: np.random.RandomState,
    *,
    width=16,
    layers=(1, 1, 1, 1),
    grid=2,
    text_width=128,
    text_layers=2,
    vocab=100,
    context=16,
    embed_dim=24,
) -> dict:
    """Random OpenAI-format CLIP ModifiedResNet state dict (numpy)."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = 1 + rng.randn(c) * 0.01
        sd[f"{name}.bias"] = rng.randn(c) * 0.01
        sd[f"{name}.running_mean"] = rng.randn(c) * 0.01
        sd[f"{name}.running_var"] = 1 + np.abs(rng.randn(c)) * 0.01

    conv("visual.conv1", 3, width // 2, 3); bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3); bn("visual.bn2", width // 2)
    conv("visual.conv3", width // 2, width, 3); bn("visual.bn3", width)
    cin = width
    for li, blocks in enumerate(layers):
        planes = width * (2 ** li)
        for j in range(blocks):
            pre = f"visual.layer{li + 1}.{j}"
            conv(f"{pre}.conv1", cin, planes, 1); bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3); bn(f"{pre}.bn2", planes)
            conv(f"{pre}.conv3", planes, planes * 4, 1)
            bn(f"{pre}.bn3", planes * 4)
            if j == 0 and (li > 0 or cin != planes * 4):
                # CLIP downsample: [avgpool, conv, bn] -> indices 1, 2
                conv(f"{pre}.downsample.1", cin, planes * 4, 1)
                bn(f"{pre}.downsample.2", planes * 4)
            cin = planes * 4
    embed = width * 32
    sd["visual.attnpool.positional_embedding"] = (
        rng.randn(grid * grid + 1, embed) * 0.05
    )
    for p in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{p}.weight"] = rng.randn(embed, embed) * 0.05
        sd[f"visual.attnpool.{p}.bias"] = rng.randn(embed) * 0.01
    sd["visual.attnpool.c_proj.weight"] = rng.randn(embed_dim, embed) * 0.05
    sd["visual.attnpool.c_proj.bias"] = rng.randn(embed_dim) * 0.01

    def blocks(prefix, w, n):
        for i in range(n):
            pre = f"{prefix}.{i}"
            sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * w, w) * 0.05
            sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * w) * 0.01
            sd[f"{pre}.attn.out_proj.weight"] = rng.randn(w, w) * 0.05
            sd[f"{pre}.attn.out_proj.bias"] = rng.randn(w) * 0.01
            sd[f"{pre}.ln_1.weight"] = 1 + rng.randn(w) * 0.01
            sd[f"{pre}.ln_1.bias"] = rng.randn(w) * 0.01
            sd[f"{pre}.ln_2.weight"] = 1 + rng.randn(w) * 0.01
            sd[f"{pre}.ln_2.bias"] = rng.randn(w) * 0.01
            sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(4 * w, w) * 0.05
            sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(4 * w) * 0.01
            sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(w, 4 * w) * 0.05
            sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(w) * 0.01

    sd["token_embedding.weight"] = rng.randn(vocab, text_width) * 0.02
    sd["positional_embedding"] = rng.randn(context, text_width) * 0.01
    blocks("transformer.resblocks", text_width, text_layers)
    sd["ln_final.weight"] = 1 + rng.randn(text_width) * 0.01
    sd["ln_final.bias"] = rng.randn(text_width) * 0.01
    sd["text_projection"] = rng.randn(text_width, embed_dim) * 0.05
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}
