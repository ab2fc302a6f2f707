"""Image preprocessing — host-exact and XLA-fused device paths.

The reference pipeline (reference: data_prepare.py:150-270):
  train:  Resize(h,w bicubic) -> RandomHorizontalFlip -> Pad(10) or Pad((10,5))
          -> RandomCrop(h,w) -> ToTensor -> Normalize -> RandomErasing(pixel)
  test:   Resize(h,w bicubic) -> ToTensor -> Normalize
  test-augmented (flip TTA): Resize -> HorizontalFlip(p=1) -> Pad((10,5))
          -> RandomCrop -> ToTensor -> Normalize

Two implementations:
  * `host_*` — PIL resize (exact torchvision numerics for the parity-critical
    deterministic eval path) + numpy augmentation. Used when bit-parity with
    the reference matters.
  * `device_*` — jit-able jnp functions over uint8 batches: resize, flip,
    pad+crop, normalize and random erasing fused into one XLA program on
    TPU; the throughput path (BASELINE.json: preprocessing fused into XLA).

Normalization constants: ViT towers use (0.5,0.5,0.5)/(0.5,0.5,0.5); RN
towers use ImageNet stats (reference: data_prepare.py:156-158).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VIT_MEAN = (0.5, 0.5, 0.5)
VIT_STD = (0.5, 0.5, 0.5)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def norm_stats(model_type: str) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    if model_type == "vit":
        return VIT_MEAN, VIT_STD
    return IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# host path (PIL-exact)
# ---------------------------------------------------------------------------


def host_resize(img, size_hw: Tuple[int, int]) -> np.ndarray:
    """PIL bicubic resize -> (H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB").resize(
        (size_hw[1], size_hw[0]), Image.BICUBIC
    )
    return np.asarray(img, np.float32) / 255.0


def host_normalize(x: np.ndarray, model_type: str = "vit") -> np.ndarray:
    mean, std = norm_stats(model_type)
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def host_test_transform(img, size_hw, model_type="vit") -> np.ndarray:
    """Deterministic eval preprocessing (reference: data_prepare.py:257-261)."""
    return host_normalize(host_resize(img, size_hw), model_type)


def host_test_augmented_transform(
    img, size_hw, model_type="vit", rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Flip-TTA pass: forced hflip + Pad((10,5)) + RandomCrop
    (reference: data_prepare.py:263-270)."""
    rng = rng or np.random.default_rng(0)
    x = host_resize(img, size_hw)[:, ::-1]
    x = np.pad(x, ((5, 5), (10, 10), (0, 0)))
    top = int(rng.integers(0, 11))
    left = int(rng.integers(0, 21))
    x = x[top : top + size_hw[0], left : left + size_hw[1]]
    return host_normalize(x, model_type)


def host_train_transform(
    img,
    size_hw,
    rng: np.random.Generator,
    model_type: str = "vit",
    pad_hw: Tuple[int, int] = (10, 10),
    erasing_prob: float = 0.5,
) -> np.ndarray:
    """Stochastic train preprocessing. pad_hw=(vertical, horizontal) extra
    pixels per side — the reference uses Pad(10) for PK loaders and
    Pad((10,5)) (5 vertical, 10 horizontal) for the plain train loader."""
    x = host_resize(img, size_hw)
    if rng.random() < 0.5:
        x = x[:, ::-1]
    pv, ph = pad_hw
    x = np.pad(x, ((pv, pv), (ph, ph), (0, 0)))
    top = int(rng.integers(0, 2 * pv + 1))
    left = int(rng.integers(0, 2 * ph + 1))
    x = x[top : top + size_hw[0], left : left + size_hw[1]]
    x = host_normalize(x, model_type)
    if rng.random() < erasing_prob:
        x = _host_random_erase(x, rng)
    return np.ascontiguousarray(x)


def _host_random_erase(
    x: np.ndarray,
    rng: np.random.Generator,
    area_range=(0.02, 1 / 3),
    aspect_range=(0.3, 10 / 3),
    attempts: int = 10,
) -> np.ndarray:
    """timm RandomErasing, mode='pixel', max_count=1: erase one rectangle
    with per-pixel N(0,1) noise (post-normalization space)."""
    h, w = x.shape[:2]
    area = h * w
    for _ in range(attempts):
        target = rng.uniform(*area_range) * area
        log_ar = rng.uniform(np.log(aspect_range[0]), np.log(aspect_range[1]))
        ar = np.exp(log_ar)
        eh = int(round(np.sqrt(target * ar)))
        ew = int(round(np.sqrt(target / ar)))
        if eh < h and ew < w:
            top = int(rng.integers(0, h - eh + 1))
            left = int(rng.integers(0, w - ew + 1))
            x = x.copy()
            x[top : top + eh, left : left + ew] = rng.standard_normal(
                (eh, ew, x.shape[2])
            ).astype(x.dtype)
            return x
    return x


# ---------------------------------------------------------------------------
# device path (XLA-fused, batched)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DevicePreprocess:
    """Jit-able batched preprocessing: uint8 (B, H, W, 3) -> normalized
    float (B, h, w, 3). All ops fuse into one XLA program; under pjit the
    batch axis shards over the data mesh."""

    size_hw: Tuple[int, int]
    model_type: str = "vit"
    dtype: jnp.dtype = jnp.float32

    def _normalize(self, x: jax.Array) -> jax.Array:
        mean, std = norm_stats(self.model_type)
        x = x.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(mean)) / jnp.asarray(std)
        return x.astype(self.dtype)

    @partial(jax.jit, static_argnums=0)
    def eval_batch(self, images_u8: jax.Array) -> jax.Array:
        h, w = self.size_hw
        b = images_u8.shape[0]
        if images_u8.shape[1:3] == (h, w):
            return self._normalize(images_u8)  # host already sized the crop
        x = jax.image.resize(
            images_u8.astype(jnp.float32), (b, h, w, 3), method="cubic"
        )
        return self._normalize(x)

    @partial(jax.jit, static_argnums=0)
    def eval_batch_raw(self, images_u8: jax.Array) -> jax.Array:
        """Raw-scale eval path for normalization-folded models
        (models.reid_clip.fold_input_norm): returns 0..255-scale values in
        self.dtype, resized if needed. Bicubic resize is a linear operator
        whose weights sum to 1, so it commutes exactly with the affine
        normalization the model has folded into its patch-embed weights.
        uint8 values are exact in bfloat16 (8 significand bits)."""
        h, w = self.size_hw
        b = images_u8.shape[0]
        if images_u8.shape[1:3] == (h, w):
            return images_u8.astype(self.dtype)
        x = jax.image.resize(
            images_u8.astype(jnp.float32), (b, h, w, 3), method="cubic"
        )
        return x.astype(self.dtype)

    @partial(jax.jit, static_argnums=0)
    def eval_flip_batch(self, images_u8: jax.Array) -> jax.Array:
        """Deterministic flip-TTA pass (center-equivalent crop: the random
        pad+crop in the reference TTA is noise, not signal — documented
        divergence; parity mode uses the host path)."""
        return self.eval_batch(images_u8[:, :, ::-1])

    @partial(jax.jit, static_argnums=0,
             static_argnames=("pad_hw", "erasing_prob"))
    def train_batch(
        self, images_u8: jax.Array, key: jax.Array,
        pad_hw: Tuple[int, int] = (10, 10), erasing_prob: float = 0.5,
    ) -> jax.Array:
        """Fused train augmentation: resize -> random flip -> pad+random crop
        -> normalize -> random erasing, one program, no host round trips."""
        h, w = self.size_hw
        b = images_u8.shape[0]
        k_flip, k_top, k_left, k_er = jax.random.split(key, 4)
        x = jax.image.resize(
            images_u8.astype(jnp.float32), (b, h, w, 3), method="cubic"
        )
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1], x)
        pv, ph = pad_hw
        x = jnp.pad(x, ((0, 0), (pv, pv), (ph, ph), (0, 0)))
        tops = jax.random.randint(k_top, (b,), 0, 2 * pv + 1)
        lefts = jax.random.randint(k_left, (b,), 0, 2 * ph + 1)

        def crop(img, top, left):
            return jax.lax.dynamic_slice(img, (top, left, 0), (h, w, 3))

        x = jax.vmap(crop)(x, tops, lefts)
        x = self._normalize(x)
        return random_erasing(x, k_er, erasing_prob)


def random_erasing(
    x: jax.Array,
    key: jax.Array,
    prob: float = 0.5,
    area_range=(0.02, 1 / 3),
    aspect_range=(0.3, 10 / 3),
) -> jax.Array:
    """Batched timm-style pixel-mode random erasing as a pure jnp mask op.

    One rectangle per image (max_count=1); a single sampling attempt with
    dimensions clamped to the image (vs the reference's up-to-10 rejection
    retries — same distribution family, jit-friendly static shapes)."""
    b, h, w, c = x.shape
    k_apply, k_area, k_ar, k_top, k_left, k_noise = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    target = jax.random.uniform(
        k_area, (b,), minval=area_range[0], maxval=area_range[1]
    ) * (h * w)
    log_ar = jax.random.uniform(
        k_ar, (b,),
        minval=jnp.log(aspect_range[0]), maxval=jnp.log(aspect_range[1]),
    )
    ar = jnp.exp(log_ar)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * ar)), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / ar)), 1, w - 1).astype(jnp.int32)
    top = (jax.random.uniform(k_top, (b,)) * (h - eh + 1)).astype(jnp.int32)
    left = (jax.random.uniform(k_left, (b,)) * (w - ew + 1)).astype(jnp.int32)

    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    in_rect = (
        (rows >= top[:, None, None]) & (rows < (top + eh)[:, None, None])
        & (cols >= left[:, None, None]) & (cols < (left + ew)[:, None, None])
        & apply[:, None, None]
    )
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    return jnp.where(in_rect[..., None], noise, x)
