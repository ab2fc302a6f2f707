"""ReID CLIP assembly — the functional equivalent of the reference's
CustomCLIP{Coop,IVLP,PromptSRC,Adapter} wrappers (reference:
prompt_learning.py:52-325), as pure functions over one params pytree.

One model = CLIP towers + prompt learner + BNNeck heads (+ adapter /
frozen zero-shot teacher). The reference's mode-flag forward
(`forward(image, label, get_image, get_texts)`) becomes separate pure
functions — jit specializes each use instead of tracing dead branches:

  * encode_image_features  — CLS triple (x11, x12, xproj)[:, 0]
  * encode_text_features   — prompt learner -> text encoder -> EOT feature
  * forward_train          — heads + features for the stage-2 loss
  * eval_embed             — cat(non_proj, proj) 1280-d retrieval embedding
    (reference: prompt_learning.py:114)

Modes:
  coop      — learned per-class text ctx only (prompt_learner trains)
  ivlp      — + deep vision/language prompt tokens inside both towers
  promptsrc — ivlp + frozen zero-shot image tower for L1 distillation
  adapter   — coop + residual Adapter blended into the non-proj feature
              at ratio 0.2 (reference: prompt_learning.py:241-242)
  maple     — multi-modal coupled prompting: shared text context + deeper
              text prompts projected into the vision tower per layer
              (reference: maple.py:647-719, 788-844)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_reid.configs import CLIPConfig
from tpu_reid.models import heads as H
from tpu_reid.models import prompts as P
from tpu_reid.models import text as T
from tpu_reid.models import vit as V

MODES = ("coop", "ivlp", "promptsrc", "adapter", "maple")


@dataclasses.dataclass(frozen=True)
class ReidModelConfig:
    mode: str  # coop | ivlp | promptsrc | adapter
    clip: CLIPConfig
    prompt: P.PromptLearnerConfig
    adapter_ratio: float = 0.2
    # Jigsaw Patch Module branch (TransReID): the reference defines the
    # JPM tower (coop.py:230-277, jpm.py) but never instantiates it from
    # any entry point; use_jpm wires it in — a 4th feature level with its
    # own BNNeck+ID head in stage 2 and a concatenated eval embedding.
    use_jpm: bool = False
    # SIE (side-information embedding, TransReID/CLIP-ReID): a learned
    # per-camera embedding scaled by sie_coe and added to the CLS token.
    # Every reference vision tower accepts the hook (`cv_emb`,
    # coop.py:210-211, custom_clip_model.py:84-85, clip_adapter.py:106-107)
    # but no reference entry point ever feeds it; sie_ids > 0 wires it.
    sie_ids: int = 0
    sie_coe: float = 1.0

    def __post_init__(self):
        assert self.mode in MODES, self.mode
        if self.use_jpm:
            # the reference pairs JPM only with the vanilla coop ViT (no
            # prompt tokens in the vision sequence — shuffling would mix
            # VPT tokens among patches)
            assert self.clip.vision is not None, "JPM needs a ViT tower"
            assert not self.clip.vision.design.has_vision_prompts, (
                "JPM is only supported without vision prompt tokens "
                "(coop/adapter family, as in the reference)"
            )

    @property
    def n_cls(self) -> int:
        return self.prompt.n_cls


def init_reid_model(
    key: jax.Array,
    cfg: ReidModelConfig,
    clip_params: dict,
    template_embedding: jax.Array,
    template_tokens: np.ndarray,
    zs_visual_params: Optional[dict] = None,
) -> dict:
    """Assemble the full params pytree around converted CLIP weights.

    zs_visual_params: frozen zero-shot teacher tower for promptsrc
    (reference: prompt_learning.py:117-189 `ZS_image_encoder`)."""
    k_pl, k_head, k_ad = jax.random.split(key, 3)
    width = (
        cfg.clip.vision.width if cfg.clip.vision is not None
        else cfg.clip.resnet.width * 32
    )
    params = {
        "clip": clip_params,
        "prompt_learner": P.init_prompt_learner(
            k_pl, cfg.prompt, template_embedding, template_tokens
        ),
        "head": H.init_classifier(
            k_head, cfg.n_cls, dim_nonproj=width, dim_proj=cfg.clip.embed_dim
        ),
    }
    if cfg.use_jpm:
        params["jpm"] = V.init_jpm(clip_params["visual"], cfg.clip.vision)
        params["jpm_head"] = {
            "bn": H.init_bnneck(width),
            "cls": H.init_classifier_head(
                jax.random.fold_in(k_head, 7), width, cfg.n_cls
            ),
        }
    if cfg.sie_ids > 0:
        # per-camera CLS offset, trunc-normal-style init std 0.02
        # (CLIP-ReID's cv_embed convention)
        params["sie_embed"] = 0.02 * jax.random.normal(
            jax.random.fold_in(k_head, 11), (cfg.sie_ids, width)
        )
    if cfg.mode == "adapter":
        params["adapter"] = H.init_adapter(k_ad, dim=width)
    if cfg.mode == "promptsrc":
        assert zs_visual_params is not None, "promptsrc needs a ZS teacher"
        params["zs_visual"] = zs_visual_params
    if cfg.mode == "maple":
        from tpu_reid.models.maple_prompts import init_maple

        d = cfg.clip.text.design
        params["maple"] = init_maple(
            jax.random.fold_in(k_ad, 3),
            n_ctx=max(d.maple_length, d.language_ctx, 1),
            depth=max(d.language_depth, 1),
            d_text=cfg.clip.text.width,
            d_vis=width,
        )
    return params


def _maple_stacks(params: dict, cfg: ReidModelConfig):
    from tpu_reid.models.maple_prompts import maple_prompt_stacks

    return maple_prompt_stacks(params["maple"], cfg.clip.vision.layers)


def _cls_triple(
    params: dict, cfg: ReidModelConfig, images: jax.Array, cv_ids=None
):
    kw = {}
    if cfg.mode == "maple":
        shallow, vdeep, _ = _maple_stacks(params, cfg)
        kw = {"deep_prompts": vdeep, "shallow_prompt": shallow}
    if cfg.sie_ids > 0:
        assert cv_ids is not None, (
            "sie_ids > 0: every image-encode call needs camera ids"
        )
        # clamp so eval splits with unseen camera ids stay in range
        cv_ids = jnp.clip(cv_ids, 0, cfg.sie_ids - 1)
        kw["cv_emb"] = cfg.sie_coe * params["sie_embed"][cv_ids]
    if cfg.use_jpm:
        kw["jpm_params"] = params["jpm"]
        x11, x12, xproj, jpm_seq = V.apply_vit(
            params["clip"]["visual"], cfg.clip.vision, images,
            cls_only=True, **kw
        )
        return x11[:, 0], x12[:, 0], xproj[:, 0], jpm_seq[:, 0]
    x11, x12, xproj = V.apply_vit(
        params["clip"]["visual"], cfg.clip.vision, images, cls_only=True, **kw
    )
    return x11[:, 0], x12[:, 0], xproj[:, 0], None


def encode_image_features(
    params: dict, cfg: ReidModelConfig, images: jax.Array, cv_ids=None
) -> dict:
    """CLS features at the three levels (reference contract:
    coop.py:203-227). Adapter mode blends the non-proj level; use_jpm adds
    the jigsaw-branch CLS as a 4th entry ("jpm"); cv_ids (B,) int camera
    ids feed the SIE embedding when sie_ids > 0."""
    last, non_proj, proj, jpm = _cls_triple(params, cfg, images, cv_ids)
    if cfg.mode == "adapter":
        non_proj = H.apply_adapter(
            params["adapter"], non_proj, cfg.adapter_ratio
        )
    out = {"last": last, "non_proj": non_proj, "proj": proj}
    if jpm is not None:
        out["jpm"] = jpm
    return out


def encode_text_features(
    params: dict, cfg: ReidModelConfig, label: jax.Array
) -> jax.Array:
    """Prompt-learner text path (reference: prompt_learning.py:77-86).

    With an augmented prompt config (n_templates > 1) the learner emits
    (B, T, L, D) prompts and the features are the mean over the per-template
    encodings (reference: coop.py:12-59 + text_encoder.py:27-53 — defined
    there but never instantiated by any reference entry point)."""
    prompts, eot = P.apply_prompt_learner(params["prompt_learner"], cfg.prompt, label)
    kw = {}
    if cfg.mode == "maple":
        _, _, tdeep = _maple_stacks(params, cfg)
        kw = {"deep_prompts": tdeep}
    if cfg.prompt.n_templates > 1:
        return T.encode_text_embeddings_augmented(
            params["clip"]["text"], cfg.clip.text, prompts, eot, **kw
        )
    return T.encode_text_embeddings(
        params["clip"]["text"], cfg.clip.text, prompts, eot, **kw
    )


def all_class_text_features(
    params: dict, cfg: ReidModelConfig, batch: int = 256
) -> jax.Array:
    """Text features for every class — the stage-2 precompute
    (reference: prompt_learning.py:506-514). Host loop over class chunks so
    the program is compiled once for one chunk shape."""
    n = cfg.n_cls
    pad = (-n) % batch
    labels = jnp.concatenate([jnp.arange(n), jnp.zeros((pad,), jnp.int32)])
    chunks = [
        encode_text_features(params, cfg, labels[i : i + batch])
        for i in range(0, n + pad, batch)
    ]
    return jnp.concatenate(chunks, axis=0)[:n]


def encode_train_features(
    params: dict, cfg: ReidModelConfig, images: jax.Array, cv_ids=None
) -> dict:
    """Image-side training encode: the feature triple (+ the frozen ZS
    teacher's non-proj feature for promptsrc). This is the hot encoder
    path — the multi-chip trainers shard_map exactly THIS function
    (per-device local batches, so the fused Pallas kernels engage) while
    heads and losses stay at the jit level where XLA gives them
    global-batch semantics (BN stats, triplet/SupCon mining over the full
    batch, matching the reference's single-device batch-global mining,
    losses.py:31-83)."""
    feats = encode_image_features(params, cfg, images, cv_ids)
    if cfg.mode == "promptsrc":
        # the teacher is a VANILLA tower — design stripped so no prompt
        # tokens are spliced into its sequence (the reference builds its
        # working ZS teacher with depth-0 design details,
        # prompt_learning_multitask.py:760-771)
        from tpu_reid.configs import PromptDesign

        zs_cfg = dataclasses.replace(
            cfg.clip.vision, design=PromptDesign()
        )
        _, zs_non_proj, _ = V.apply_vit(
            params["zs_visual"], zs_cfg, images, cls_only=True
        )
        feats["zs_non_proj"] = jax.lax.stop_gradient(zs_non_proj[:, 0])
    return feats


def forward_train(
    params: dict, cfg: ReidModelConfig, images: jax.Array, train: bool = True,
    valid: Optional[jax.Array] = None, encode_fn=None, cv_ids=None,
) -> dict:
    """Training-time forward for the stage-2 loss (reference:
    prompt_learning.py:301-317): ID logits at both BNNeck levels + the
    feature triple + optionally the frozen ZS teacher's non-proj feature.
    valid: (B,) row mask — padded rows stay out of the BNNeck batch stats.
    encode_fn overrides encode_train_features (multi-chip trainers pass a
    shard_map-wrapped version). cv_ids: camera ids for SIE."""
    feats = (encode_fn or encode_train_features)(
        params, cfg, images, cv_ids
    )
    head = H.apply_classifier(
        params["head"], feats["non_proj"], feats["proj"], train=train,
        valid=valid,
    )
    out = {
        "cls_scores": (head["logits"], head["logits_proj"]),
        "features": (feats["last"], feats["non_proj"], feats["proj"]),
        "proj": feats["proj"],
        "bn_stats": head["new_stats"],
    }
    if cfg.use_jpm:
        # JPM = a 4th feature level: its own BNNeck + ID head joins the
        # 0.25-weighted CE sum and the triplet runs on the raw JPM CLS —
        # the same treatment every other level gets in the stage-2 loss
        # (the reference defines no JPM consumer; this mirrors TransReID's
        # jigsaw-branch training and the reference's per-level loss shape,
        # prompt_learning.py:483-502)
        bn_jpm, jpm_stats = H.apply_bnneck(
            params["jpm_head"]["bn"], feats["jpm"], train, valid=valid
        )
        out["cls_scores"] = out["cls_scores"] + (
            H.apply_classifier_head(params["jpm_head"]["cls"], bn_jpm),
        )
        out["features"] = out["features"] + (feats["jpm"],)
        out["bn_stats"] = dict(out["bn_stats"], jpm=jpm_stats)
    if "zs_non_proj" in feats:
        out["zs_non_proj"] = feats["zs_non_proj"]
    return out


def eval_embed(
    params: dict, cfg: ReidModelConfig, images: jax.Array, cv_ids=None
) -> jax.Array:
    """Retrieval embedding: cat(non_proj CLS, proj CLS) — 1280-d for
    ViT-B/16 (reference: prompt_learning.py:114, :324). With use_jpm the
    jigsaw-branch CLS is concatenated as well (the reference defines no
    JPM eval contract; TransReID-style feature concat). With SIE, cv_ids
    must carry the batch's camera ids (applied at inference too, as in
    CLIP-ReID)."""
    feats = encode_image_features(params, cfg, images, cv_ids)
    parts = [feats["non_proj"], feats["proj"]]
    if cfg.use_jpm:
        parts.append(feats["jpm"])
    return jnp.concatenate(parts, axis=-1)


def fold_input_norm(
    params: dict, cfg: ReidModelConfig, model_type: str = "vit"
) -> dict:
    """Fold the per-channel input normalization into the patch-embed conv.

    The eval preprocess is an affine map x = u/255*(1/std) - mean/std and
    the patch embed is linear, so conv(norm(u)) == conv_scaled(u) + bias
    with w' = w / (255*std_c) and bias_o = -sum_khwc w[..,c,o]*mean_c/std_c
    — EXACT math, done once per program on the (p, p, 3, width) weight.
    Extraction then feeds raw uint8-scale images (DevicePreprocess raw
    mode) and the normalization pass (~3.2 ms/batch at B=512 on v5e, a
    full HBM round-trip of the image tensor) disappears. Bicubic resize
    and horizontal flip are linear/permutation ops that commute with the
    affine, so resized/TTA paths stay exact too.

    ViT towers only (the RN stem's conv1 is equally foldable but the RN
    path is not the throughput north star). Returns a NEW params pytree;
    cheap enough to apply inside the jitted extraction step."""
    assert cfg.clip.vision is not None, "fold_input_norm: ViT towers only"
    out = dict(params)
    out["clip"] = dict(params["clip"])
    out["clip"]["visual"] = V.fold_visual_input_norm(
        params["clip"]["visual"], model_type
    )
    if "zs_visual" in params:  # promptsrc teacher sees the same raw input
        out["zs_visual"] = V.fold_visual_input_norm(
            params["zs_visual"], model_type
        )
    return out


# ---------------------------------------------------------------------------
# parameter partitions (what trains in each stage)
# ---------------------------------------------------------------------------


def stage1_trainable(path: Tuple[str, ...], cfg: ReidModelConfig) -> bool:
    """Stage 1 trains the prompt learner ctx (+ VPT tokens for ivlp/promptsrc)
    (reference: prompt_learning.py:396-402)."""
    if path[0] == "prompt_learner":
        return path[-1] == "cls_ctx"  # frozen prefix/suffix/eot stay put
    if path[0] == "maple":
        return True  # shared ctx + deeper text prompts + couplings
    if cfg.mode in ("ivlp", "promptsrc"):
        return any(p.startswith("vpt_") for p in path)
    return False


def stage2_trainable(path: Tuple[str, ...], cfg: ReidModelConfig) -> bool:
    """Stage 2 freezes prompts + VPT, trains the image tower + heads
    (reference: prompt_learning.py:528-543). The text tower is also updated
    by the reference (only prompt_learner/VPT are frozen) — mirrored here."""
    if path[0] in ("prompt_learner", "zs_visual", "maple"):
        return False
    # the text tower takes no gradient in stage 2 (text features are
    # precomputed constants); leaving it "trainable" would still decay it
    # through the coupled-L2 Adam, which the reference never does (torch
    # skips params with grad=None). Same for the unused logit_scale.
    if path[0] == "clip" and path[1] == "text":
        return False
    if path[-1] == "logit_scale":
        return False
    if any(p.startswith("vpt_") for p in path):
        return False
    # BNNeck bias frozen at zero (reference: utils.py:133)
    if path[0] == "head" and path[1] in ("bn", "bn_proj") and path[-1] == "bias":
        return False
    if path[0] == "jpm_head" and path[1] == "bn" and path[-1] == "bias":
        return False
    # BN running stats are state, not parameters
    if path[-1] in ("mean", "var"):
        return False
    return True
