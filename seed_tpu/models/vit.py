"""Vision transformers, TPU-first.

Covers the three vision towers of the reference stack:

- EVA-ViT-g  (reference: models/seed_qformer/eva_vit.py:461-486 — patch 14,
  dim 1408, depth 39, heads 16, mlp 6144, q/v-only qkv bias, pre-norm
  eps 1e-6, no final norm; output [B, 257, 1408])
- CLIP-ViT-L (reference: models/seed_qformer/clip_vit.py:238-257 — patch 14,
  width 1024, depth 23, heads 16, QuickGELU, ln_pre)
- the plain 4-block decode stacks of the quantizer
  (models/seed_qformer/qformer_quantizer.py:240-264 via vit.py Block)

TPU-first design choices (not a port):
- Patch embedding is a reshape + one MXU matmul — a stride=kernel conv is
  exactly that, and XLA tiles the matmul onto the MXU directly.
- All blocks are *stacked* along a leading depth axis and applied with
  ``lax.scan``: one compiled block body instead of 39 unrolled ones
  (compile time and HLO size drop ~40x), with identical math.
- LayerNorm in fp32, matmuls in bf16 with fp32 accumulation.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from . import layers as L


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1408
    depth: int = 39
    heads: int = 16
    mlp_dim: int = 6144
    qkv_bias: str = "qv"        # "qv" (EVA: q+v bias, k zero) | "full" | "none"
    # "gelu" (exact erf — torch nn.GELU parity) | "quick_gelu" (CLIP) |
    # "gelu_tanh" (serving-mode approximation: ~9% faster full-encode on
    # v5e — erf lowers to more VPU ops than tanh; opt-in, changes ~2% of
    # emitted token ids, same order as W8A8)
    act: str = "gelu"
    ln_eps: float = 1e-6
    ln_pre: bool = False        # CLIP-style pre-transformer LayerNorm
    patch_bias: bool = True
    channels: int = 3
    # W8A8 int8 serving for the frozen encoder: block matmuls whose params
    # were quantized (ops/quantization.quantize_tree with VIT_TARGETS) run
    # int8 x int8 -> int32 on the MXU (2x bf16 TOPS on v5e). Norms,
    # attention softmax paths, patch embed stay bf16/fp32.
    w8a8: bool = False
    # Route block attention through the Pallas short-sequence kernel
    # (ops/flash_attention._short_mha). The XLA path materializes the
    # fp32 [257, 257] score tensor per head in HBM — measured at 49% of
    # EVA-ViT encode time for 3% of its FLOPs (PERF.md round 2,
    # scripts/probe_encode_cost.py); the kernel keeps scores in VMEM.
    # Same math (fp32 softmax), float-reassociated.
    use_flash: bool = False
    # With use_flash: run the kernel's OP-FAITHFUL branch (normalize the
    # fp32 probabilities and round to bf16 BEFORE P@V, exactly the XLA
    # mha op sequence) instead of the faster normalize-at-end epilogue.
    # This is what lets the bit-exact encode path keep its VQ indices
    # while moving attention off the HBM score tensor (PERF.md round 4).
    flash_exact: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


EVA_VIT_G = ViTConfig()  # eva_vit.py:461-474: mlp = int(1408 * 4.3637) = 6144
CLIP_VIT_L = ViTConfig(dim=1024, depth=23, heads=16, mlp_dim=4096,
                       qkv_bias="full", act="quick_gelu", ln_eps=1e-5,
                       ln_pre=True, patch_bias=False)
# CLIP-ViT-H/14 (laion2b): the stage-2 distillation target tower
# (blip2_qformer_codebook_all_image.py uses CLIPVisionModelWithProjection)
CLIP_VIT_H = ViTConfig(dim=1280, depth=32, heads=16, mlp_dim=5120,
                       qkv_bias="full", act="gelu", ln_eps=1e-5,
                       ln_pre=True, patch_bias=False)
# tiny config for tests
TINY_VIT = ViTConfig(image_size=28, patch_size=14, dim=32, depth=2, heads=2,
                     mlp_dim=64)


def _act(cfg: ViTConfig):
    if cfg.act == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if cfg.act == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    return L.gelu


# ------------------------------ init --------------------------------------

def init_block(key, dim: int, mlp_dim: int, qkv_bias: str, dtype=jnp.float32):
    ks = L.split_keys(key, 4)
    attn = {"qkv": L.init_linear(ks[0], dim, 3 * dim, bias=(qkv_bias == "full"), dtype=dtype),
            "proj": L.init_linear(ks[1], dim, dim, dtype=dtype)}
    if qkv_bias == "qv":
        attn["q_bias"] = jnp.zeros((dim,), dtype)
        attn["v_bias"] = jnp.zeros((dim,), dtype)
    return {
        "norm1": L.init_layer_norm(dim, dtype),
        "attn": attn,
        "norm2": L.init_layer_norm(dim, dtype),
        "mlp": {"fc1": L.init_linear(ks[2], dim, mlp_dim, dtype=dtype),
                "fc2": L.init_linear(ks[3], mlp_dim, dim, dtype=dtype)},
    }


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32):
    ks = L.split_keys(key, cfg.depth + 3)
    patch_in = cfg.patch_size * cfg.patch_size * cfg.channels
    params = {
        "patch_embed": L.init_linear(ks[0], patch_in, cfg.dim,
                                     bias=cfg.patch_bias, dtype=dtype),
        "cls_token": (jax.random.normal(ks[1], (1, 1, cfg.dim)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(ks[2], (1, cfg.num_patches + 1, cfg.dim)) * 0.02).astype(dtype),
        "blocks": stack_blocks([init_block(ks[3 + i], cfg.dim, cfg.mlp_dim,
                                           cfg.qkv_bias, dtype)
                                for i in range(cfg.depth)]),
    }
    if cfg.ln_pre:
        params["ln_pre"] = L.init_layer_norm(cfg.dim, dtype)
    return params


def stack_blocks(blocks):
    """Stack a list of identically-structured block trees along axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)


def unstack_blocks(stacked, depth: int):
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(depth)]


# ----------------------------- forward ------------------------------------

def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] with (di, dj, c) flattening."""
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch * patch * C)


def _lin(p, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    if cfg.w8a8 and "kernel_q" in p:
        return L.linear_w8a8(p, x)
    return L.linear(p, x)


def block_apply(p, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """Pre-norm transformer block (eva_vit.py Block.forward semantics)."""
    B, N, D = x.shape
    H, hd = cfg.heads, cfg.head_dim
    act = _act(cfg)

    h = L.layer_norm(p["norm1"], x, cfg.ln_eps)
    qkv = _lin(p["attn"]["qkv"], h, cfg)  # adds the full bias if present
    if "q_bias" in p["attn"] and "bias" not in p["attn"]["qkv"]:
        # EVA: bias on q and v only; k bias fixed at zero (eva_vit.py:136-139).
        # Exclusive with a full qkv bias — a tree carrying both must not
        # double-count q and v.
        bias = jnp.concatenate([p["attn"]["q_bias"],
                                jnp.zeros_like(p["attn"]["q_bias"]),
                                p["attn"]["v_bias"]])
        qkv = qkv + bias.astype(qkv.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, H, hd)
    k = k.reshape(B, N, H, hd)
    v = v.reshape(B, N, H, hd)
    if cfg.use_flash:
        from ..ops.flash_attention import flash_attention
        o = flash_attention(q, k, v, exact=cfg.flash_exact).reshape(B, N, D)
    else:
        o = mha(q, k, v).reshape(B, N, D)
    x = x + _lin(p["attn"]["proj"], o, cfg)

    h = L.layer_norm(p["norm2"], x, cfg.ln_eps)
    h = _lin(p["mlp"]["fc2"], act(_lin(p["mlp"]["fc1"], h, cfg)), cfg)
    return x + h


def blocks_apply(stacked, x: jnp.ndarray, cfg: ViTConfig,
                 remat: bool = False) -> jnp.ndarray:
    """Scan a stacked block tree over the sequence of depths."""
    body = block_apply
    if remat:
        body = jax.checkpoint(body, static_argnums=(2,))

    def step(carry, blk):
        return body(blk, carry, cfg), None

    out, _ = jax.lax.scan(step, x, stacked)
    return out


def init_clip_vision_projection(key, cfg: ViTConfig, proj_dim: int = 1024,
                                dtype=jnp.float32):
    """ln_post + visual projection head (CLIPVisionModelWithProjection):
    the stage-2 distillation target produces image_embeds [B, proj_dim]."""
    return {"ln_post": L.init_layer_norm(cfg.dim, dtype),
            "proj": L.init_linear(key, cfg.dim, proj_dim, bias=False,
                                  dtype=dtype)}


def clip_image_embed(vit_params, head_params, images: jnp.ndarray,
                     cfg: ViTConfig) -> jnp.ndarray:
    """images -> CLIP image_embeds [B, proj_dim] (CLS -> ln_post -> proj)."""
    x = vit_apply(vit_params, images, cfg)
    cls = L.layer_norm(head_params["ln_post"], x[:, 0], cfg.ln_eps)
    return L.linear(head_params["proj"], cls)


def vit_apply(params, images: jnp.ndarray, cfg: ViTConfig,
              remat: bool = False) -> jnp.ndarray:
    """images [B, H, W, C] (already resized + normalized) -> [B, N+1, dim].

    Matches eva_vit.py:369-390 / clip_vit.py:171-187: patch embed, prepend
    cls, add pos embed, (optional ln_pre,) blocks. No final norm — the
    caller applies ln_vision (blip2.py:76).
    """
    patches = patchify(images, cfg.patch_size)
    x = L.linear(params["patch_embed"], patches)
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    if cfg.ln_pre:
        x = L.layer_norm(params["ln_pre"], x, cfg.ln_eps)
    return blocks_apply(params["blocks"], x, cfg, remat=remat)
