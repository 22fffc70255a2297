"""Device-side fused image preprocessing.

Replaces the reference's CPU torchvision pipeline (models/transforms.py:4-21,
models/seed_llama_tokenizer.py:50-56: Resize(bicubic, antialiased) ->
ToTensor -> Normalize(CLIP mean/std)). On TPU the whole chain runs inside
the encode jit: uint8 HBM bytes in, normalized bf16 out, fused by XLA with
the patch-embed matmul — no host round trip per image.

PIL's antialiased bicubic uses the Keys cubic kernel (a = -0.5), the same
kernel family as jax.image.resize(method="bicubic", antialias=True); pixel
differences are at the 1e-3 level, which empirically leaves SEED token IDs
unchanged (SURVEY.md §7 hard-parts note documents this tolerance).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# CLIP normalization constants (models/seed_llama_tokenizer.py:55)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """float [B,H,W,3] in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((images.astype(jnp.float32) - mean) / std).astype(dtype)


def resize_bicubic(images: jnp.ndarray, size: Tuple[int, int],
                   antialias: bool = True) -> jnp.ndarray:
    b, _, _, c = images.shape
    return jax.image.resize(images.astype(jnp.float32),
                            (b, size[0], size[1], c),
                            method="bicubic", antialias=antialias)


def preprocess(images_u8: jnp.ndarray, image_size: int = 224,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> normalized [B,image_size,image_size,3] ``dtype``.

    The full transform of get_transform('clip') with square resize
    (the inference default, seed_llama_tokenizer.py:51).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if images_u8.shape[1:3] != (image_size, image_size):
        x = resize_bicubic(x, (image_size, image_size))
    return normalize(x, dtype)


def random_resized_crop_flip(
    key: jax.Array,
    images: jnp.ndarray,            # float [B, H, W, 3] in [0,1]
    image_size: int = 224,
    scale: Tuple[float, float] = (0.5, 1.0),
    flip: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Training augmentation (blip2_image_train, blip_processors.py:226+):
    per-example random-area crop + horizontal flip + CLIP normalize, fully
    on device and batched (static shapes: crop via scale-and-translate
    resize rather than dynamic slicing)."""
    B, H, W, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (B,), minval=scale[0], maxval=scale[1])
    side = jnp.sqrt(area)                       # aspect kept ~1 for TPU shapes
    max_off_h = (1.0 - side) * H
    max_off_w = (1.0 - side) * W
    off_h = jax.random.uniform(k2, (B,)) * max_off_h
    off_w = jax.random.uniform(k3, (B,)) * max_off_w

    def crop_one(img, s, oh, ow):
        sc = image_size / (s * H)
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            (image_size, image_size, 3),
            (0, 1), jnp.asarray([sc, sc]),
            jnp.asarray([-oh * sc, -ow * sc]),
            method="bilinear")

    out = jax.vmap(crop_one)(images, side, off_h, off_w)
    if flip:
        do = jax.random.bernoulli(k4, 0.5, (B,))
        out = jnp.where(do[:, None, None, None], out[:, :, ::-1, :], out)
    return normalize(jnp.clip(out, 0.0, 1.0), dtype)


def center_crop_resize(images_u8: jnp.ndarray, image_size: int = 224,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """Resize-shortest-side + center-crop variant (models/transforms.py:8-12).

    Static-shape friendly: implemented as resize to a scale where the short
    side equals ``image_size``... for batched fixed-size input we resize the
    short side then crop the long side center.
    """
    b, h, w, c = images_u8.shape
    x = images_u8.astype(jnp.float32) / 255.0
    if h < w:
        new_h, new_w = image_size, max(image_size, round(w * image_size / h))
    else:
        new_h, new_w = max(image_size, round(h * image_size / w)), image_size
    x = resize_bicubic(x, (new_h, new_w))
    top = (new_h - image_size) // 2
    left = (new_w - image_size) // 2
    x = x[:, top:top + image_size, left:left + image_size, :]
    return normalize(x, dtype)
