"""Discrete vision model — the reference's experimental alternative tokenizer.

Reference: MultiModalLLM/src/tokenizer/discrete_vision_model/modeling.py
(dormant — not imported by any entry point; built here for component parity).
Two variants:

- ``DiscreteVisionModel`` (modeling.py:52-139): a frozen CLIP vision tower
  with projection produces ``last_hidden_state`` (the reconstruction target)
  and ``image_embeds`` (the contrastive target). A small transformer
  *quant encoder* maps the hidden states into a 32-d code space, a
  VectorQuantizer2 (beta=0.25, legacy=False — modeling.py:76) discretizes,
  and a *quant decoder* reconstructs the hidden states. The decoded CLS
  re-enters the tower's own post-LN + visual projection (tie_projection,
  :83-85) and is pulled toward ``image_embeds`` with a CLIP-style symmetric
  cross-entropy. NOTE two faithful quirks of the reference contrastive
  (:125-139): embeddings are NOT l2-normalized, and ``logit_scale`` (init
  2.6592) multiplies the logits directly — it is never exponentiated.

- ``dvm_clip_embed_loss`` (DiscreteVisionModelFroClipEmbed, :240-300):
  quantizes the pooled 1024-d CLIP image embedding itself. The embed is
  expanded to ``num_token`` latent tokens either by a single linear
  (SimpleEmbedEncoder :303-330) or by 1-D patching + a transformer
  (CLIPEmbedEncoder :142-203), quantized (optionally with the Norm-EMA
  codebook of quantizer.py:239-329), and decoded back to one embedding;
  loss = quant + rec only.

TPU-first notes: the quant encoder/decoder stacks reuse the scanned
full-bias pre-LN blocks of ``models/vit.py`` (HF CLIPEncoderLayer math —
fused qkv == separate q/k/v projections), the frozen tower runs under
``stop_gradient`` instead of requires_grad bookkeeping, and the contrastive
all-gather is a differentiable ``lax.all_gather`` over the data axis
(concat_all_gather's no-grad gather + local-grad matmul has the same
gradient as gathering activations that only this shard produced).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from . import layers as L
from . import quantizer as Q
from . import vit as V


@dataclass(frozen=True)
class DVMConfig:
    # frozen tower width / targets (CLIP-ViT-H with projection by default)
    hidden: int = 1280          # tower last_hidden_state dim
    proj_dim: int = 1024        # tower image_embeds dim
    # quant encoder/decoder transformer stacks (CLIPEncoder equivalents)
    depth: int = 4
    heads: int = 16
    mlp_dim: int = 5120
    # codebook
    n_codes: int = 8192
    code_dim: int = 32
    beta: float = 0.25
    # loss scales (modeling.py:59-61)
    scale_rec: float = 1.0
    scale_quant: float = 1.0
    scale_contrastive: float = 1.0

    @property
    def block_cfg(self) -> V.ViTConfig:
        # HF CLIPEncoderLayer: pre-LN, full qkv bias, quick_gelu, eps 1e-5
        return V.ViTConfig(dim=self.hidden, depth=self.depth,
                           heads=self.heads, mlp_dim=self.mlp_dim,
                           qkv_bias="full", act="quick_gelu", ln_eps=1e-5)


TINY_DVM = DVMConfig(hidden=32, proj_dim=16, depth=2, heads=2, mlp_dim=64,
                     n_codes=64, code_dim=8)


def init_dvm(key, cfg: DVMConfig, dtype=jnp.float32):
    ks = L.split_keys(key, 5)
    blocks = lambda k: V.stack_blocks(
        [V.init_block(kk, cfg.hidden, cfg.mlp_dim, "full", dtype)
         for kk in L.split_keys(k, cfg.depth)])
    return {
        "quant_encoder": blocks(ks[0]),
        "encode_task": L.init_linear(ks[1], cfg.hidden, cfg.code_dim,
                                     dtype=dtype),
        "vq": Q.init_codebook(ks[2], cfg.n_codes, cfg.code_dim, dtype),
        "decode_task": L.init_linear(ks[3], cfg.code_dim, cfg.hidden,
                                     dtype=dtype),
        "quant_decoder": blocks(ks[4]),
        # modeling.py:81 — plain parameter, applied linearly (never exp'd)
        "logit_scale": jnp.asarray(2.6592, dtype),
    }


def dvm_encode(params, rec_target: jnp.ndarray, cfg: DVMConfig) -> jnp.ndarray:
    """Tower hidden states [B, N, hidden] -> discrete code ids [B, N]."""
    h = V.blocks_apply(params["quant_encoder"], rec_target, cfg.block_cfg)
    z = L.linear(params["encode_task"], h)
    return Q.nearest_codes(params["vq"]["codebook"], z.astype(jnp.float32))


def dvm_decode(params, indices: jnp.ndarray, cfg: DVMConfig) -> jnp.ndarray:
    """Code ids [B, N] -> reconstructed tower hidden states [B, N, hidden]."""
    z_q = Q.lookup(params["vq"], indices)
    h = L.linear(params["decode_task"], z_q)
    return V.blocks_apply(params["quant_decoder"], h, cfg.block_cfg)


def clip_contrastive_loss(logit_scale: jnp.ndarray, embed_x: jnp.ndarray,
                          embed_y: jnp.ndarray,
                          axis_name: Optional[str] = None) -> jnp.ndarray:
    """Symmetric CE over UNnormalized embeds with a LINEAR logit scale —
    faithful to modeling.py:125-139 (no l2norm, no exp)."""
    if axis_name is not None:
        embed_x = jax.lax.all_gather(embed_x, axis_name, tiled=True)
        embed_y = jax.lax.all_gather(embed_y, axis_name, tiled=True)
    xf = embed_x.astype(jnp.float32)
    yf = embed_y.astype(jnp.float32)
    logits = logit_scale.astype(jnp.float32) * (xf @ yf.T)
    n = logits.shape[0]
    labels = jnp.arange(n)
    logp_x = jax.nn.log_softmax(logits, axis=-1)
    logp_y = jax.nn.log_softmax(logits.T, axis=-1)
    loss_x = -jnp.mean(logp_x[labels, labels])
    loss_y = -jnp.mean(logp_y[labels, labels])
    return (loss_x + loss_y) / 2.0


def dvm_loss(params, tower_params, tower_head, images: jnp.ndarray,
             cfg: DVMConfig, tower_cfg: V.ViTConfig,
             axis_name: Optional[str] = None):
    """Full DiscreteVisionModel.forward (modeling.py:96-123).

    tower_params/tower_head: the frozen CLIP vision tower (vit_apply) and
    its ln_post + visual projection (init_clip_vision_projection) — the
    head is shared with the decode side via tie_projection (:83-85).
    Returns (total_loss, metrics dict).
    """
    sg = jax.lax.stop_gradient
    hidden = sg(V.vit_apply(tower_params, images, tower_cfg))
    rec_target = hidden                                           # [B, N, D]
    cls = L.layer_norm(tower_head["ln_post"], hidden[:, 0], tower_cfg.ln_eps)
    iti_target = sg(L.linear(tower_head["proj"], cls))            # [B, P]

    h = V.blocks_apply(params["quant_encoder"], rec_target, cfg.block_cfg)
    z = L.linear(params["encode_task"], h)
    vq = Q.quantize(params["vq"], z, beta=cfg.beta, legacy=False)

    h = L.linear(params["decode_task"], vq.quantized)
    predict_state = V.blocks_apply(params["quant_decoder"], h, cfg.block_cfg)

    # tie_projection: the decoded CLS re-enters the tower's own head. The
    # head params are frozen with the tower (modeling.py:89-94), so wrap
    # them in stop_gradient; gradients still flow into predict_state.
    pooled = L.layer_norm(jax.tree.map(sg, tower_head["ln_post"]),
                          predict_state[:, 0], tower_cfg.ln_eps)
    predict_embed = L.linear(jax.tree.map(sg, tower_head["proj"]), pooled)

    loss_rec = jnp.mean(
        (predict_state.astype(jnp.float32) - rec_target.astype(jnp.float32))
        ** 2)
    loss_iti = clip_contrastive_loss(params["logit_scale"], predict_embed,
                                     iti_target, axis_name)
    total = (cfg.scale_rec * loss_rec + cfg.scale_quant * vq.loss
             + cfg.scale_contrastive * loss_iti)
    return total, {"loss_rec": loss_rec, "loss_quant": vq.loss,
                   "loss_iti": loss_iti, "indices": vq.indices}


# ---- FroClipEmbed variant: quantize the pooled CLIP embedding ------------

@dataclass(frozen=True)
class ClipEmbedDVMConfig:
    embed_dim: int = 1024       # pooled CLIP image_embeds dim
    num_token: int = 16         # latent tokens the embed expands into
    code_dim: int = 32
    n_codes: int = 8192
    beta: float = 0.25
    encoder: str = "simple"     # "simple" (linear) | "transformer" (1-D patch)
    act: str = "no"             # SimpleEmbedEncoder act_type (:311-314)
    quantizer: str = "st"       # "st" (VectorQuantizer2) | "norm_ema"
    # transformer encoder/decoder geometry (CLIPEmbedEncoder path)
    hidden: int = 256
    depth: int = 2
    heads: int = 4
    mlp_dim: int = 1024
    scale_rec: float = 1.0
    scale_quant: float = 1.0

    @property
    def patch(self) -> int:
        # CLIPEmbedEmbeddings (:152): num_patches = image_size // patch_size
        # with the 1024-d embed playing the "image". num_token tokens.
        return self.embed_dim // self.num_token

    @property
    def block_cfg(self) -> V.ViTConfig:
        return V.ViTConfig(dim=self.hidden, depth=self.depth,
                           heads=self.heads, mlp_dim=self.mlp_dim,
                           qkv_bias="full", act="quick_gelu", ln_eps=1e-5)


def init_clip_embed_dvm(key, cfg: ClipEmbedDVMConfig, dtype=jnp.float32):
    ks = L.split_keys(key, 9)
    if cfg.encoder == "simple":
        # SimpleEmbedEncoder/Decoder (:303-360): one linear each way
        enc = {"linear": L.init_linear(ks[0], cfg.embed_dim,
                                       cfg.hidden * cfg.num_token,
                                       dtype=dtype)}
        dec = {"linear": L.init_linear(ks[1], cfg.hidden * cfg.num_token,
                                       cfg.embed_dim, dtype=dtype)}
    else:
        blocks = lambda k: V.stack_blocks(
            [V.init_block(kk, cfg.hidden, cfg.mlp_dim, "full", dtype)
             for kk in L.split_keys(k, cfg.depth)])
        # CLIPEmbedEmbeddings: conv1d(kernel=stride=patch, no bias) over the
        # embed vector == patch-reshape + linear; learned pos embedding.
        enc = {"patch": L.init_linear(ks[0], cfg.patch, cfg.hidden,
                                      bias=False, dtype=dtype),
               "pos": (jax.random.normal(ks[2], (1, cfg.num_token,
                                                 cfg.hidden)) * 0.02
                       ).astype(dtype),
               "blocks": blocks(ks[3])}
        # CLIPEmbedDecoder (:206-237): transformer + flatten projection
        dec = {"blocks": blocks(ks[4]),
               "proj": L.init_linear(ks[5], cfg.num_token * cfg.hidden,
                                     cfg.embed_dim, dtype=dtype)}
    if cfg.quantizer == "norm_ema":
        vq = Q.init_ema_codebook(ks[6], cfg.n_codes, cfg.code_dim)
    else:
        vq = Q.init_codebook(ks[6], cfg.n_codes, cfg.code_dim, dtype)
    return {
        "quant_encoder": enc,
        "encode_task": L.init_linear(ks[7], cfg.hidden, cfg.code_dim,
                                     dtype=dtype),
        "vq": vq,
        "decode_task": L.init_linear(ks[8], cfg.code_dim, cfg.hidden,
                                     dtype=dtype),
        "quant_decoder": dec,
    }


def _embed_encode(params, clip_embed, cfg: ClipEmbedDVMConfig):
    B = clip_embed.shape[0]
    if cfg.encoder == "simple":
        h = L.linear(params["linear"], clip_embed)
        h = h.reshape(B, cfg.num_token, cfg.hidden)
        if cfg.act == "gelu":
            h = L.gelu(h)
        return h
    patches = clip_embed.reshape(B, cfg.num_token, cfg.patch)
    h = L.linear(params["patch"], patches) + params["pos"].astype(
        clip_embed.dtype)
    return V.blocks_apply(params["blocks"], h, cfg.block_cfg)


def _embed_decode(params, h, cfg: ClipEmbedDVMConfig):
    B = h.shape[0]
    if cfg.encoder == "simple":
        if cfg.act == "gelu":
            h = L.gelu(h)
        return L.linear(params["linear"], h.reshape(B, -1))
    h = V.blocks_apply(params["blocks"], h, cfg.block_cfg)
    return L.linear(params["proj"], h.reshape(B, -1))


def dvm_clip_embed_loss(params, clip_embed: jnp.ndarray,
                        cfg: ClipEmbedDVMConfig):
    """DiscreteVisionModelFroClipEmbed.forward (modeling.py:276-300).

    clip_embed [B, embed_dim] — the (frozen, precomputed or stop_gradient)
    pooled CLIP image embedding. Returns (loss, metrics incl. the
    reconstructed embedding and code indices).
    """
    target = jax.lax.stop_gradient(clip_embed.astype(jnp.float32))
    h = _embed_encode(params["quant_encoder"], clip_embed, cfg)
    z = L.linear(params["encode_task"], h)
    if cfg.quantizer == "norm_ema":
        vq = Q.norm_ema_quantize(params["vq"], z, beta=cfg.beta)
    else:
        vq = Q.quantize(params["vq"], z, beta=cfg.beta, legacy=False)
    h = L.linear(params["decode_task"], vq.quantized)
    predict = _embed_decode(params["quant_decoder"], h, cfg)
    loss_rec = jnp.mean((predict.astype(jnp.float32) - target) ** 2)
    total = cfg.scale_quant * vq.loss + cfg.scale_rec * loss_rec
    return total, {"loss_rec": loss_rec, "loss_quant": vq.loss,
                   "predict_embed": predict, "indices": vq.indices,
                   "z": z}
