"""AutoencoderKL decoder (SD 2.1 VAE), NHWC TPU layout.

The reference decodes latents with diffusers' AutoencoderKL
(pipeline_stable_unclip_img2img.py:781: ``vae.decode(latents /
scaling_factor)``). Only the decoder half is needed for de-tokenization;
the encoder half is included for completeness (img2img-style init and
future training).

Architecture (SD VAE): latent 4ch -> post_quant_conv 1x1 -> conv_in ->
mid (resnet, self-attn, resnet) -> 4 up levels x (3 resnets) with nearest
x2 upsample between -> GroupNorm -> silu -> conv_out 3ch. Channels
(512, 512, 256, 128) going up; output in [-1, 1].
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from .. import layers as L
from .unet import conv2d, group_norm, init_conv, init_gn


@dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)   # encoder order
    layers_per_block: int = 2                        # decoder uses +1
    norm_groups: int = 32
    out_channels: int = 3
    scaling_factor: float = 0.18215


SD_VAE = VAEConfig()
TINY_VAE = VAEConfig(base_channels=8, channel_mults=(1, 2), norm_groups=4)


def _init_resnet(key, cin, cout, dtype):
    ks = L.split_keys(key, 3)
    p = {"norm1": init_gn(cin, dtype), "conv1": init_conv(ks[0], 3, 3, cin, cout, dtype),
         "norm2": init_gn(cout, dtype), "conv2": init_conv(ks[1], 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["conv_shortcut"] = init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _resnet(p, x, groups):
    h = jax.nn.silu(group_norm(p["norm1"], x, groups))
    h = conv2d(p["conv1"], h)
    h = jax.nn.silu(group_norm(p["norm2"], h, groups))
    h = conv2d(p["conv2"], h)
    skip = conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return skip + h


def _init_attn(key, c, dtype):
    ks = L.split_keys(key, 4)
    return {"norm": init_gn(c, dtype),
            "to_q": L.init_linear(ks[0], c, c, dtype=dtype),
            "to_k": L.init_linear(ks[1], c, c, dtype=dtype),
            "to_v": L.init_linear(ks[2], c, c, dtype=dtype),
            "to_out": L.init_linear(ks[3], c, c, dtype=dtype)}


def _attn(p, x, groups):
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x, groups).reshape(B, H * W, C)
    q = L.linear(p["to_q"], h)[:, :, None, :]   # single head
    k = L.linear(p["to_k"], h)[:, :, None, :]
    v = L.linear(p["to_v"], h)[:, :, None, :]
    o = mha(q, k, v).reshape(B, H * W, C)
    return x + L.linear(p["to_out"], o).reshape(B, H, W, C)


def init_vae_decoder(key, cfg: VAEConfig = SD_VAE, dtype=jnp.float32):
    ks = iter(L.split_keys(key, 64))
    C = [cfg.base_channels * m for m in cfg.channel_mults]   # e.g. [128,256,512,512]
    top = C[-1]
    p = {
        "post_quant_conv": init_conv(next(ks), 1, 1, cfg.latent_channels,
                                     cfg.latent_channels, dtype),
        "conv_in": init_conv(next(ks), 3, 3, cfg.latent_channels, top, dtype),
        "mid": {"resnets": [_init_resnet(next(ks), top, top, dtype),
                            _init_resnet(next(ks), top, top, dtype)],
                "attn": _init_attn(next(ks), top, dtype)},
        "up_blocks": [],
        "conv_norm_out": init_gn(C[0], dtype),
        "conv_out": init_conv(next(ks), 3, 3, C[0], cfg.out_channels, dtype),
    }
    # decoder runs reversed(channel_mults): top -> ... -> base
    prev = top
    for i, c in enumerate(reversed(C)):
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_init_resnet(next(ks), prev if j == 0 else c,
                                                 c, dtype))
        if i < len(C) - 1:
            block["upsample"] = init_conv(next(ks), 3, 3, c, c, dtype)
        p["up_blocks"].append(block)
        prev = c
    return p


def vae_decode(params, latents: jnp.ndarray,
               cfg: VAEConfig = SD_VAE) -> jnp.ndarray:
    """latents [B,h,w,4] (already divided by scaling_factor by the caller,
    or pass raw and set divide=True in the pipeline) -> images [B,8h,8w,3]
    in [-1, 1]."""
    G = cfg.norm_groups
    x = conv2d(params["post_quant_conv"], latents)
    x = conv2d(params["conv_in"], x)
    x = _resnet(params["mid"]["resnets"][0], x, G)
    x = _attn(params["mid"]["attn"], x, G)
    x = _resnet(params["mid"]["resnets"][1], x, G)
    for block in params["up_blocks"]:
        for r in block["resnets"]:
            x = _resnet(r, x, G)
        if "upsample" in block:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            x = conv2d(block["upsample"], x)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, G))
    return conv2d(params["conv_out"], x)
