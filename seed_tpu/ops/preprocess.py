"""Device-side fused image preprocessing.

Replaces the reference's CPU torchvision pipeline (models/transforms.py:4-21,
models/seed_llama_tokenizer.py:50-56: Resize(bicubic, antialiased) ->
ToTensor -> Normalize(CLIP mean/std)). On TPU the whole chain runs inside
the encode jit: uint8 HBM bytes in, normalized bf16 out, fused by XLA with
the patch-embed matmul — no host round trip per image.

Resize parity with the reference, MEASURED (tests/test_processors.py):

- ``resize_bicubic`` (float path) matches PIL's continuous bicubic
  (mode-"F" resize: same Keys a=-0.5 kernel, same antialiasing) to
  max |delta| <= 3e-5 over random + natural-statistics corpora.
- The reference, however, resizes PIL *uint8* images (torchvision
  Resize on PIL input, models/transforms.py:4-21): PIL then runs TWO
  fixed-point passes with clipping+rounding to uint8 after EACH pass.
  Versus that path the float resize differs by up to 0.18 (overshoot
  clipping) and round+clip of the float result still leaves ~20% of
  pixels off by >=1/255 (two-pass quantization compounds).
- ``resize_bicubic_pil`` therefore emulates PIL's integer resampling
  exactly (same coefficient quantization, per-pass clip8): output is
  BIT-IDENTICAL to PIL BICUBIC uint8 resize on every tested image, so
  resized inputs preserve bit-exact SEED token-ID parity end-to-end.
  ``preprocess`` uses it by default whenever a resize is needed.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


# PIL Resample.c fixed-point precision (8bpc images)
_PIL_PRECISION_BITS = 32 - 8 - 2


def _pil_bicubic_weight(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    w1 = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    w2 = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, w1, np.where(x < 2.0, w2, 0.0))


def _pil_bilinear_weight(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


# (weight fn, filter support) per PIL filter — Resample.c BILINEAR/BICUBIC
_PIL_FILTERS = {"bicubic": (_pil_bicubic_weight, 2.0),
                "bilinear": (_pil_bilinear_weight, 1.0)}


@functools.lru_cache(maxsize=64)
def _pil_coeff_matrix(in_size: int, out_size: int,
                      filt: str = "bicubic") -> np.ndarray:
    """Dense [out, in] int32 coefficient matrix reproducing PIL
    precompute_coeffs + normalize_coeffs_8bpc exactly (support window,
    per-row normalization, round-half-away quantization)."""
    weight_fn, base_support = _PIL_FILTERS[filt]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = base_support * filterscale
    ss = 1.0 / filterscale
    kk = np.zeros((out_size, in_size), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(max(0, np.floor(center - support)))
        xmax = int(min(in_size, np.ceil(center + support)))
        idx = np.arange(xmin, xmax)
        w = weight_fn((idx - center + 0.5) * ss)
        w = w / w.sum()
        q = np.where(w >= 0, w * (1 << _PIL_PRECISION_BITS) + 0.5,
                     w * (1 << _PIL_PRECISION_BITS) - 0.5).astype(np.int32)
        kk[xx, xmin:xmax] = q
    return kk


def resize_bicubic_pil(images_u8: jnp.ndarray, size: Tuple[int, int],
                       interpolation: str = "bicubic") -> jnp.ndarray:
    """BIT-EXACT emulation of ``PIL.Image.resize(size, BICUBIC)`` on uint8
    images — the reference's actual preprocessing numerics (torchvision
    Resize applies PIL's two-pass fixed-point resampler with clip8 after
    each pass). uint8 [B,H,W,C] -> uint8 [B,size[0],size[1],C].
    ``interpolation`` may be "bicubic" (PIL default for Image.resize and
    seed_llama_tokenizer.py:51's interpolation=3) or "bilinear"
    (torchvision transforms.Resize default, models/transforms.py:9).

    All-integer math on device: two int32 contractions (horizontal then
    vertical, PIL's pass order) + shift/clip epilogues; coefficient
    tables are built host-side with PIL's exact quantization and cached
    per (in, out) size pair."""
    B, H, W, C = images_u8.shape
    kh = jnp.asarray(_pil_coeff_matrix(W, size[1], interpolation))  # [outW, W]
    kv = jnp.asarray(_pil_coeff_matrix(H, size[0], interpolation))  # [outH, H]
    half = 1 << (_PIL_PRECISION_BITS - 1)
    x = images_u8.astype(jnp.int32)
    acc = jnp.einsum("bhwc,ow->bhoc", x, kh,
                     preferred_element_type=jnp.int32)
    x = jnp.clip((acc + half) >> _PIL_PRECISION_BITS, 0, 255)
    acc = jnp.einsum("bhwc,oh->bowc", x, kv,
                     preferred_element_type=jnp.int32)
    x = jnp.clip((acc + half) >> _PIL_PRECISION_BITS, 0, 255)
    return x.astype(jnp.uint8)


def preprocess(images_u8: jnp.ndarray, image_size: int = 224,
               dtype=jnp.bfloat16, pil_exact: bool = True) -> jnp.ndarray:
    """uint8 [B,H,W,3] -> normalized [B,image_size,image_size,3] ``dtype``.

    The full transform of get_transform('clip') with square resize
    (the inference default, seed_llama_tokenizer.py:51). When a resize is
    needed, ``pil_exact=True`` (default) reproduces the reference's PIL
    uint8 resize bit-exactly (see module docstring); ``pil_exact=False``
    uses the continuous float bicubic (no quantization — preferable when
    the input did not come from a PIL pipeline)."""
    if images_u8.shape[1:3] != (image_size, image_size):
        if pil_exact:
            images_u8 = resize_bicubic_pil(images_u8,
                                           (image_size, image_size))
            x = images_u8.astype(jnp.float32) / 255.0
        else:
            x = resize_bicubic(images_u8.astype(jnp.float32) / 255.0,
                               (image_size, image_size))
    else:
        x = images_u8.astype(jnp.float32) / 255.0
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


def torchvision_resize_size(h: int, w: int, short: int) -> Tuple[int, int]:
    """torchvision ``transforms.Resize(short)`` output size: the short side
    becomes ``short`` and the long side scales with int() TRUNCATION
    (torchvision functional_pil.resize semantics — NOT round())."""
    if (w <= h and w == short) or (h <= w and h == short):
        return h, w
    if w < h:
        return int(short * h / w), short
    return short, int(short * w / h)


def torchvision_crop_box(h: int, w: int, size: int) -> Tuple[int, int]:
    """torchvision ``transforms.CenterCrop(size)`` top/left: uses
    ``int(round((dim - size) / 2.0))`` — Python banker's rounding, which
    differs from floor on odd differences (e.g. diff 7 -> top 4 not 3)."""
    return int(round((h - size) / 2.0)), int(round((w - size) / 2.0))


def center_crop_resize_pil(images_u8: jnp.ndarray, image_size: int = 224,
                           interpolation: str = "bilinear",
                           dtype=jnp.bfloat16) -> jnp.ndarray:
    """BIT-EXACT ``Resize(image_size) + CenterCrop(image_size)`` — the
    reference's keep_ratio=True transform branch
    (models/transforms.py:8-12; torchvision defaults: BILINEAR
    interpolation, truncating short-side size math, banker's-rounded crop
    offsets) — followed by ToTensor + CLIP Normalize, on device.

    uint8 [B,H,W,3] -> normalized [B,image_size,image_size,3] ``dtype``.
    NOTE: the reference demo's SHIPPED config uses keep_ratio=False
    (configs/transform/clip_transform.yaml) and the tokenizer's own
    processor is square BICUBIC (seed_llama_tokenizer.py:51) — this
    function covers the get_transform default branch for parity."""
    b, h, w, c = images_u8.shape
    new_h, new_w = torchvision_resize_size(h, w, image_size)
    if (new_h, new_w) != (h, w):
        images_u8 = resize_bicubic_pil(images_u8, (new_h, new_w),
                                       interpolation=interpolation)
    top, left = torchvision_crop_box(new_h, new_w, image_size)
    x = images_u8[:, top:top + image_size, left:left + image_size, :]
    return normalize(x.astype(jnp.float32) / 255.0, dtype)
