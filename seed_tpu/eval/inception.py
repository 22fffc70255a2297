"""InceptionV3 pool3 feature extractor for FID.

Rebuilds the reference's FID feature network
(MultiModalLLM/src/eval/inception.py — the pytorch-fid InceptionV3
wrapper over torchvision, block 3 / 2048-d "final average pooling"
features) as a functional NHWC JAX network:

- every BasicConv2d (conv + BatchNorm(eps=1e-3) + ReLU) is stored with
  the eval-mode BN FOLDED into a per-channel scale/bias — exact for a
  frozen eval network and one fused multiply-add on TPU instead of a
  separate normalization pass;
- the wrapper's preprocessing is reproduced exactly: bilinear resize to
  299x299 with ``align_corners=True`` (inception.py:112 F.upsample) and
  the channel remap ``x*(std/0.5) + (mean-0.5)/0.5`` (inception.py:115-118);
- pooling semantics match torch: MaxPool2d(3, stride=2) valid, and the
  branch_pool AvgPool2d(3, stride=1, padding=1) with
  ``count_include_pad=True`` (divide by 9 at borders too).

Weight conversion from a ``torchvision.models.inception_v3`` state dict
lives in :mod:`seed_tpu.convert.torch_convert`
(``convert_inception_torch``); :data:`INCEPTION_CONVS` below is the
shared layer-spec table.

Use with :func:`seed_tpu.eval.metrics.fid` as the pluggable feature fn:
``lambda imgs01: np.asarray(inception_pool3(params, imgs01))``.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)

# name -> (c_in, c_out, (kh, kw), (sh, sw), (ph, pw)) — torchvision
# inception_v3 layer table, flattened with dotted module paths
_A = lambda pre, cin, pool: {
    f"{pre}.branch1x1": (cin, 64, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch5x5_1": (cin, 48, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch5x5_2": (48, 64, (5, 5), (1, 1), (2, 2)),
    f"{pre}.branch3x3dbl_1": (cin, 64, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
    f"{pre}.branch3x3dbl_3": (96, 96, (3, 3), (1, 1), (1, 1)),
    f"{pre}.branch_pool": (cin, pool, (1, 1), (1, 1), (0, 0)),
}
_B = lambda pre, cin: {
    f"{pre}.branch3x3": (cin, 384, (3, 3), (2, 2), (0, 0)),
    f"{pre}.branch3x3dbl_1": (cin, 64, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3dbl_2": (64, 96, (3, 3), (1, 1), (1, 1)),
    f"{pre}.branch3x3dbl_3": (96, 96, (3, 3), (2, 2), (0, 0)),
}
_C = lambda pre, c7: {
    f"{pre}.branch1x1": (768, 192, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch7x7_1": (768, c7, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch7x7_2": (c7, c7, (1, 7), (1, 1), (0, 3)),
    f"{pre}.branch7x7_3": (c7, 192, (7, 1), (1, 1), (3, 0)),
    f"{pre}.branch7x7dbl_1": (768, c7, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch7x7dbl_2": (c7, c7, (7, 1), (1, 1), (3, 0)),
    f"{pre}.branch7x7dbl_3": (c7, c7, (1, 7), (1, 1), (0, 3)),
    f"{pre}.branch7x7dbl_4": (c7, c7, (7, 1), (1, 1), (3, 0)),
    f"{pre}.branch7x7dbl_5": (c7, 192, (1, 7), (1, 1), (0, 3)),
    f"{pre}.branch_pool": (768, 192, (1, 1), (1, 1), (0, 0)),
}
_D = lambda pre: {
    f"{pre}.branch3x3_1": (768, 192, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3_2": (192, 320, (3, 3), (2, 2), (0, 0)),
    f"{pre}.branch7x7x3_1": (768, 192, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch7x7x3_2": (192, 192, (1, 7), (1, 1), (0, 3)),
    f"{pre}.branch7x7x3_3": (192, 192, (7, 1), (1, 1), (3, 0)),
    f"{pre}.branch7x7x3_4": (192, 192, (3, 3), (2, 2), (0, 0)),
}
_E = lambda pre, cin: {
    f"{pre}.branch1x1": (cin, 320, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3_1": (cin, 384, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3_2a": (384, 384, (1, 3), (1, 1), (0, 1)),
    f"{pre}.branch3x3_2b": (384, 384, (3, 1), (1, 1), (1, 0)),
    f"{pre}.branch3x3dbl_1": (cin, 448, (1, 1), (1, 1), (0, 0)),
    f"{pre}.branch3x3dbl_2": (448, 384, (3, 3), (1, 1), (1, 1)),
    f"{pre}.branch3x3dbl_3a": (384, 384, (1, 3), (1, 1), (0, 1)),
    f"{pre}.branch3x3dbl_3b": (384, 384, (3, 1), (1, 1), (1, 0)),
    f"{pre}.branch_pool": (cin, 192, (1, 1), (1, 1), (0, 0)),
}

INCEPTION_CONVS: Dict[str, Tuple] = {
    "Conv2d_1a_3x3": (3, 32, (3, 3), (2, 2), (0, 0)),
    "Conv2d_2a_3x3": (32, 32, (3, 3), (1, 1), (0, 0)),
    "Conv2d_2b_3x3": (32, 64, (3, 3), (1, 1), (1, 1)),
    "Conv2d_3b_1x1": (64, 80, (1, 1), (1, 1), (0, 0)),
    "Conv2d_4a_3x3": (80, 192, (3, 3), (1, 1), (0, 0)),
    **_A("Mixed_5b", 192, 32), **_A("Mixed_5c", 256, 64),
    **_A("Mixed_5d", 288, 64),
    **_B("Mixed_6a", 288),
    **_C("Mixed_6b", 128), **_C("Mixed_6c", 160), **_C("Mixed_6d", 160),
    **_C("Mixed_6e", 192),
    **_D("Mixed_7a"),
    **_E("Mixed_7b", 1280), **_E("Mixed_7c", 2048),
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def init_inception(key, dtype=jnp.float32, with_fc: bool = False):
    """Random-init parameter tree (shape source of truth; real use loads
    converted torchvision weights — convert_inception_torch).
    ``with_fc`` adds the 1000-way classifier head (Inception Score)."""
    params = {}
    keys = jax.random.split(key, len(INCEPTION_CONVS) + 1)
    for (name, (cin, cout, k, _, _)), kk in zip(INCEPTION_CONVS.items(),
                                                keys):
        fan_in = cin * k[0] * k[1]
        params[name] = {
            "kernel": (jax.random.normal(kk, (*k, cin, cout))
                       * (2.0 / fan_in) ** 0.5).astype(dtype),
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
        }
    if with_fc:
        params["fc"] = {
            "kernel": (jax.random.normal(keys[-1], (2048, 1000))
                       * 2048 ** -0.5).astype(dtype),
            "bias": jnp.zeros((1000,), dtype),
        }
    return params


def _conv(p, x, name):
    _, _, _, stride, pad = INCEPTION_CONVS[name]
    y = jax.lax.conv_general_dilated(
        x, p[name]["kernel"].astype(x.dtype), stride,
        [(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * p[name]["scale"].astype(y.dtype) + p[name]["bias"].astype(y.dtype)
    return jax.nn.relu(y)


def _max_pool_3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avg_pool_3x3s1p1(x):
    # torch AvgPool2d(3, 1, padding=1) count_include_pad=True: /9 everywhere
    s = jax.lax.reduce_window(x, jnp.asarray(0, x.dtype), jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / jnp.asarray(9, x.dtype)


def _mixed_a(p, x, pre):
    b1 = _conv(p, x, f"{pre}.branch1x1")
    b5 = _conv(p, _conv(p, x, f"{pre}.branch5x5_1"), f"{pre}.branch5x5_2")
    b3 = _conv(p, _conv(p, _conv(p, x, f"{pre}.branch3x3dbl_1"),
                        f"{pre}.branch3x3dbl_2"), f"{pre}.branch3x3dbl_3")
    bp = _conv(p, _avg_pool_3x3s1p1(x), f"{pre}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _mixed_b(p, x, pre):
    b3 = _conv(p, x, f"{pre}.branch3x3")
    bd = _conv(p, _conv(p, _conv(p, x, f"{pre}.branch3x3dbl_1"),
                        f"{pre}.branch3x3dbl_2"), f"{pre}.branch3x3dbl_3")
    return jnp.concatenate([b3, bd, _max_pool_3x3s2(x)], axis=-1)


def _mixed_c(p, x, pre):
    b1 = _conv(p, x, f"{pre}.branch1x1")
    b7 = x
    for s in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
        b7 = _conv(p, b7, f"{pre}.{s}")
    bd = x
    for s in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5"):
        bd = _conv(p, bd, f"{pre}.{s}")
    bp = _conv(p, _avg_pool_3x3s1p1(x), f"{pre}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _mixed_d(p, x, pre):
    b3 = _conv(p, _conv(p, x, f"{pre}.branch3x3_1"), f"{pre}.branch3x3_2")
    b7 = x
    for s in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
              "branch7x7x3_4"):
        b7 = _conv(p, b7, f"{pre}.{s}")
    return jnp.concatenate([b3, b7, _max_pool_3x3s2(x)], axis=-1)


def _mixed_e(p, x, pre):
    b1 = _conv(p, x, f"{pre}.branch1x1")
    b3 = _conv(p, x, f"{pre}.branch3x3_1")
    b3 = jnp.concatenate([_conv(p, b3, f"{pre}.branch3x3_2a"),
                          _conv(p, b3, f"{pre}.branch3x3_2b")], axis=-1)
    bd = _conv(p, _conv(p, x, f"{pre}.branch3x3dbl_1"),
               f"{pre}.branch3x3dbl_2")
    bd = jnp.concatenate([_conv(p, bd, f"{pre}.branch3x3dbl_3a"),
                          _conv(p, bd, f"{pre}.branch3x3dbl_3b")], axis=-1)
    bp = _conv(p, _avg_pool_3x3s1p1(x), f"{pre}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@functools.lru_cache(maxsize=8)
def _align_corners_coeffs(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear matrix with torch align_corners=True sampling:
    src = i * (in-1) / (out-1)."""
    if in_size == 1 or out_size == 1:
        m = np.zeros((out_size, in_size), np.float32)
        m[:, 0] = 1.0
        return m
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  size: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.upsample(mode='bilinear', align_corners=True)`` on NHWC."""
    B, H, W, C = x.shape
    kv = jnp.asarray(_align_corners_coeffs(H, size[0]))
    kh = jnp.asarray(_align_corners_coeffs(W, size[1]))
    y = jnp.einsum("bhwc,oh->bowc", x.astype(jnp.float32), kv)
    return jnp.einsum("bhwc,ow->bhoc", y, kh)


def _trunk(params, x: jnp.ndarray) -> jnp.ndarray:
    """Blocks 0-3 + global average pool: [B, H, W, 3] -> [B, 2048]."""
    # block 0
    for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
        x = _conv(params, x, name)
    x = _max_pool_3x3s2(x)
    # block 1
    x = _conv(params, _conv(params, x, "Conv2d_3b_1x1"), "Conv2d_4a_3x3")
    x = _max_pool_3x3s2(x)
    # block 2
    for pre in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _mixed_a(params, x, pre)
    x = _mixed_b(params, x, "Mixed_6a")
    for pre in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _mixed_c(params, x, pre)
    # block 3
    x = _mixed_d(params, x, "Mixed_7a")
    x = _mixed_e(params, x, "Mixed_7b")
    x = _mixed_e(params, x, "Mixed_7c")
    return jnp.mean(x, axis=(1, 2))          # AdaptiveAvgPool2d((1, 1))


def inception_pool3(params, images01: jnp.ndarray,
                    resize_input: bool = True,
                    normalize_input: bool = True) -> jnp.ndarray:
    """[B, H, W, 3] images in [0, 1] (NHWC) -> [B, 2048] pool3 features.

    Mirrors InceptionV3.forward (inception.py:93-124) with
    output_blocks=[3]: optional align-corners bilinear resize to 299, the
    exact channel remap, blocks 0-3, global average pool."""
    x = images01
    if resize_input:
        x = resize_bilinear_align_corners(x, (299, 299))
    x = x.astype(jnp.float32)
    if normalize_input:
        std = jnp.asarray(IMAGENET_STD, jnp.float32) / 0.5
        mean = (jnp.asarray(IMAGENET_MEAN, jnp.float32) - 0.5) / 0.5
        x = x * std + mean
    return _trunk(params, x)


def inception_logits(params, images_pm1: jnp.ndarray,
                     resize_input: bool = True) -> jnp.ndarray:
    """[B, H, W, 3] images in [-1, 1] (NHWC) -> [B, 1000] classifier
    logits.

    Mirrors the reference Inception-Score feature path
    (MultiModalLLM/src/eval/inception_score.py:35-43): torchvision
    ``inception_v3(transform_input=False).eval()`` fed raw [-1, 1]
    pixels, with the optional ``nn.Upsample(299, 'bilinear')`` resize
    (align_corners=False — half-pixel centers, i.e. jax.image.resize
    semantics), then trunk -> global avg pool -> (eval-mode dropout =
    identity) -> fc. Requires ``params["fc"]``
    (init_inception(with_fc=True) / converted torchvision fc)."""
    x = images_pm1.astype(jnp.float32)
    if resize_input:
        B, _, _, C = x.shape
        x = jax.image.resize(x, (B, 299, 299, C), "bilinear")
    pool = _trunk(params, x)
    fc = params["fc"]
    return pool @ fc["kernel"].astype(pool.dtype) + fc["bias"].astype(
        pool.dtype)


def inception_probs(params, images_pm1: jnp.ndarray,
                    resize_input: bool = True) -> jnp.ndarray:
    """Class probabilities for :func:`seed_tpu.eval.metrics.
    inception_score` (the reference softmaxes the logits,
    inception_score.py:43)."""
    return jax.nn.softmax(inception_logits(params, images_pm1,
                                           resize_input), axis=-1)
