"""UNet2DCondition for the unCLIP de-tokenizer, TPU-first (NHWC).

Rebuilds the denoiser the reference drives through diffusers
(models/pipeline_stable_unclip_img2img.py:753-775: ``unet(latent, t,
encoder_hidden_states=prompt_embeds, class_labels=image_embeds)``) — the
stable-diffusion-2-1-unclip UNet: 4-ch latents, block channels
(320, 640, 1280, 1280), 2 layers/block, cross-attention dim 1024, linear
transformer projections, and the unCLIP twist: ``class_embed_type=
"projection"`` feeds the (noised CLIP image embedding ++ its sinusoidal
noise-level embedding) through a TimestepEmbedding MLP and ADDS it to the
time embedding — that is how 32 SEED tokens steer the whole UNet.

TPU-first choices:
- NHWC everywhere (TPU conv layout), convs via lax.conv_general_dilated
- GroupNorm in fp32; attention through the shared fp32-softmax mha op
- one function per block type, params as plain pytrees mirroring the
  diffusers names for conversion
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from .. import layers as L
from .schedulers import timestep_embedding


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)  # heads per level
    # which levels have transformer blocks (SD2.x: all but the last down /
    # first up level)
    attn_levels: Tuple[bool, ...] = (True, True, True, False)
    norm_groups: int = 32
    class_embed_input_dim: Optional[int] = 2048   # unCLIP projection input
    time_embed_dim: Optional[int] = None          # default 4*C0

    @property
    def temb_dim(self) -> int:
        return self.time_embed_dim or 4 * self.block_channels[0]


SD21_UNCLIP_UNET = UNetConfig()
TINY_UNET = UNetConfig(block_channels=(8, 16), attention_head_dim=(2, 2),
                       attn_levels=(True, False), layers_per_block=1,
                       cross_attention_dim=12, norm_groups=4,
                       class_embed_input_dim=10)


# ------------------------------- primitives --------------------------------

def conv2d(p, x, stride: int = 1):
    # explicit symmetric padding (torch conv semantics): with stride 2 on
    # even inputs XLA's SAME pads (0,1) while torch pads (1,1) — weight
    # conversion parity requires the torch behavior
    kh, kw = p["kernel"].shape[:2]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(y.dtype)


def group_norm(p, x, groups: int, eps: float = 1e-5):
    B, H, W, C = x.shape
    orig = x.dtype
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(orig)


def init_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kh * kw * cin
    k = jax.random.normal(key, (kh, kw, cin, cout)) / jnp.sqrt(fan_in)
    return {"kernel": k.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def init_gn(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ------------------------------- resnet block ------------------------------

def init_resnet(key, cin, cout, temb_dim, dtype=jnp.float32):
    ks = L.split_keys(key, 4)
    p = {
        "norm1": init_gn(cin, dtype),
        "conv1": init_conv(ks[0], 3, 3, cin, cout, dtype),
        "time_emb_proj": L.init_linear(ks[1], temb_dim, cout, dtype=dtype),
        "norm2": init_gn(cout, dtype),
        "conv2": init_conv(ks[2], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = init_conv(ks[3], 1, 1, cin, cout, dtype)
    return p


def resnet_apply(p, x, temb, groups):
    h = jax.nn.silu(group_norm(p["norm1"], x, groups))
    h = conv2d(p["conv1"], h)
    t = L.linear(p["time_emb_proj"], jax.nn.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = jax.nn.silu(group_norm(p["norm2"], h, groups))
    h = conv2d(p["conv2"], h)
    skip = conv2d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    return skip + h


# --------------------------- transformer block -----------------------------

def init_attention(key, dim, kv_dim, dtype=jnp.float32):
    ks = L.split_keys(key, 4)
    return {"to_q": L.init_linear(ks[0], dim, dim, bias=False, dtype=dtype),
            "to_k": L.init_linear(ks[1], kv_dim, dim, bias=False, dtype=dtype),
            "to_v": L.init_linear(ks[2], kv_dim, dim, bias=False, dtype=dtype),
            "to_out": L.init_linear(ks[3], dim, dim, dtype=dtype)}


def attention_apply(p, x, ctx, heads):
    B, N, D = x.shape
    M = ctx.shape[1]
    hd = D // heads
    q = L.linear(p["to_q"], x).reshape(B, N, heads, hd)
    k = L.linear(p["to_k"], ctx).reshape(B, M, heads, hd)
    v = L.linear(p["to_v"], ctx).reshape(B, M, heads, hd)
    o = mha(q, k, v).reshape(B, N, D)
    return L.linear(p["to_out"], o)


def init_transformer_block(key, dim, kv_dim, dtype=jnp.float32):
    ks = L.split_keys(key, 5)
    return {
        "norm1": L.init_layer_norm(dim, dtype),
        "attn1": init_attention(ks[0], dim, dim, dtype),
        "norm2": L.init_layer_norm(dim, dtype),
        "attn2": init_attention(ks[1], dim, kv_dim, dtype),
        "norm3": L.init_layer_norm(dim, dtype),
        "ff": {"proj": L.init_linear(ks[2], dim, 8 * dim, dtype=dtype),   # GEGLU
               "out": L.init_linear(ks[3], 4 * dim, dim, dtype=dtype)},
    }


def transformer_block_apply(p, x, ctx, heads):
    h = L.layer_norm(p["norm1"], x)
    x = x + attention_apply(p["attn1"], h, h, heads)
    x = x + attention_apply(p["attn2"], L.layer_norm(p["norm2"], x), ctx, heads)
    h = L.layer_norm(p["norm3"], x)
    h = L.linear(p["ff"]["proj"], h)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * L.gelu(gate)
    return x + L.linear(p["ff"]["out"], h)


def init_spatial_transformer(key, c, kv_dim, dtype=jnp.float32):
    ks = L.split_keys(key, 3)
    return {
        "norm": init_gn(c, dtype),
        "proj_in": L.init_linear(ks[0], c, c, dtype=dtype),   # linear projection
        "blocks": [init_transformer_block(ks[1], c, kv_dim, dtype)],
        "proj_out": L.init_linear(ks[2], c, c, dtype=dtype),
    }


def spatial_transformer_apply(p, x, ctx, heads, groups):
    B, H, W, C = x.shape
    res = x
    h = group_norm(p["norm"], x, groups)
    h = h.reshape(B, H * W, C)
    h = L.linear(p["proj_in"], h)
    for blk in p["blocks"]:
        h = transformer_block_apply(blk, h, ctx, heads)
    h = L.linear(p["proj_out"], h)
    return res + h.reshape(B, H, W, C)


# ------------------------------ UNet ---------------------------------------

def init_unet(key, cfg: UNetConfig = SD21_UNCLIP_UNET, dtype=jnp.float32):
    ks = iter(L.split_keys(key, 256))
    C = cfg.block_channels
    temb = cfg.temb_dim
    p: dict = {
        "conv_in": init_conv(next(ks), 3, 3, cfg.in_channels, C[0], dtype),
        "time_embedding": {
            "linear_1": L.init_linear(next(ks), C[0], temb, dtype=dtype),
            "linear_2": L.init_linear(next(ks), temb, temb, dtype=dtype)},
        "down_blocks": [], "up_blocks": [],
        "conv_norm_out": init_gn(C[0], dtype),
        "conv_out": init_conv(next(ks), 3, 3, C[0], cfg.out_channels, dtype),
    }
    if cfg.class_embed_input_dim:
        p["class_embedding"] = {
            "linear_1": L.init_linear(next(ks), cfg.class_embed_input_dim,
                                      temb, dtype=dtype),
            "linear_2": L.init_linear(next(ks), temb, temb, dtype=dtype)}

    n_levels = len(C)
    for i in range(n_levels):
        cin = C[max(i - 1, 0)]
        cout = C[i]
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                init_resnet(next(ks), cin if j == 0 else cout, cout, temb, dtype))
            if cfg.attn_levels[i]:
                block["attentions"].append(init_spatial_transformer(
                    next(ks), cout, cfg.cross_attention_dim, dtype))
        if i < n_levels - 1:
            block["downsample"] = init_conv(next(ks), 3, 3, cout, cout, dtype)
        p["down_blocks"].append(block)

    p["mid_block"] = {
        "resnets": [init_resnet(next(ks), C[-1], C[-1], temb, dtype),
                    init_resnet(next(ks), C[-1], C[-1], temb, dtype)],
        "attentions": [init_spatial_transformer(
            next(ks), C[-1], cfg.cross_attention_dim, dtype)],
    }

    for i in reversed(range(n_levels)):
        cout = C[i]
        cskip_bottom = C[max(i - 1, 0)]       # channels of the deepest skip
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            res_skip = cout if j < cfg.layers_per_block else cskip_bottom
            cin_prev = C[min(i + 1, n_levels - 1)] if j == 0 else cout
            block["resnets"].append(init_resnet(
                next(ks), cin_prev + res_skip, cout, temb, dtype))
            if cfg.attn_levels[i]:
                block["attentions"].append(init_spatial_transformer(
                    next(ks), cout, cfg.cross_attention_dim, dtype))
        if i > 0:
            block["upsample"] = init_conv(next(ks), 3, 3, cout, cout, dtype)
        p["up_blocks"].append(block)
    return p


def unet_apply(params, latents: jnp.ndarray, timesteps: jnp.ndarray,
               encoder_hidden_states: jnp.ndarray,
               class_labels: Optional[jnp.ndarray] = None,
               cfg: UNetConfig = SD21_UNCLIP_UNET) -> jnp.ndarray:
    """latents [B,H,W,4] NHWC, timesteps [B], ctx [B,M,kv], class_labels
    [B, class_embed_input_dim] -> noise/v prediction [B,H,W,4]."""
    C = cfg.block_channels
    G = cfg.norm_groups

    temb = timestep_embedding(timesteps, C[0], flip_sin_to_cos=True,
                              downscale_freq_shift=0.0)
    temb = temb.astype(latents.dtype)
    te = params["time_embedding"]
    temb = L.linear(te["linear_2"], jax.nn.silu(L.linear(te["linear_1"], temb)))
    if class_labels is not None and "class_embedding" in params:
        ce = params["class_embedding"]
        cemb = L.linear(ce["linear_2"], jax.nn.silu(
            L.linear(ce["linear_1"], class_labels.astype(temb.dtype))))
        temb = temb + cemb          # unCLIP conditioning enters here

    ctx = encoder_hidden_states
    x = conv2d(params["conv_in"], latents)
    skips = [x]
    for i, block in enumerate(params["down_blocks"]):
        heads = cfg.attention_head_dim[i]
        for j, resnet in enumerate(block["resnets"]):
            x = resnet_apply(resnet, x, temb, G)
            if block["attentions"]:
                x = spatial_transformer_apply(block["attentions"][j], x, ctx,
                                              heads, G)
            skips.append(x)
        if "downsample" in block:
            x = conv2d(block["downsample"], x, stride=2)
            skips.append(x)

    mid = params["mid_block"]
    x = resnet_apply(mid["resnets"][0], x, temb, G)
    x = spatial_transformer_apply(mid["attentions"][0], x, ctx,
                                  cfg.attention_head_dim[-1], G)
    x = resnet_apply(mid["resnets"][1], x, temb, G)

    n_levels = len(C)
    for bi, block in enumerate(params["up_blocks"]):
        level = n_levels - 1 - bi
        heads = cfg.attention_head_dim[level]
        for j, resnet in enumerate(block["resnets"]):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = resnet_apply(resnet, x, temb, G)
            if block["attentions"]:
                x = spatial_transformer_apply(block["attentions"][j], x, ctx,
                                              heads, G)
        if "upsample" in block:
            B, H, W, Cc = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, Cc), method="nearest")
            x = conv2d(block["upsample"], x)

    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, G))
    return conv2d(params["conv_out"], x)
