"""SEED-2 visual tokenizer: image -> 32 discrete causal token ids -> unCLIP
generation embedding.

This is the TPU rebuild of Blip2QformerQuantizer
(models/seed_qformer/qformer_quantizer.py:143-374) and the ImageTokenizer
wrapper (models/seed_llama_tokenizer.py:24-113):

encode  (get_codebook_indices :288-307):
  image [B,224,224,3] -> EVA-ViT-g -> ln_vision -> causal Q-Former (32
  queries) -> encode_task_layer (768 -> 768 -> tanh -> 32) -> VQ argmin
  over the 8192 x 32 codebook -> int32 ids [B, 32]

decode_embedding  (get_codebook_entry :309-338):
  ids [B,32] -> codebook -> decode_task_layer (32 -> 32 -> tanh -> 768)
  -> + pos_embed_image -> 4 ViT blocks -> image_down MLP
  (768 -> 256 -> 128 -> 32, ReLU, no bias) -> flatten -> distill_image_proj
  (1024 -> 1024) = the unCLIP image embedding fed to the diffusion
  de-tokenizer.

The whole encode graph is a single jittable function: one XLA program,
bf16 on the MXU, fp32 for LayerNorm statistics and VQ distances.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from . import quantizer as VQ
from .qformer import QFormerConfig, SEED_QFORMER, TINY_QFORMER, init_qformer, qformer_apply
from .vit import (EVA_VIT_G, TINY_VIT, ViTConfig, blocks_apply, init_block,
                  init_vit, stack_blocks, vit_apply)


@dataclass(frozen=True)
class SeedTokenizerConfig:
    vit: ViTConfig = EVA_VIT_G
    qformer: QFormerConfig = SEED_QFORMER
    codebook_size: int = 8192
    code_dim: int = 32
    decode_depth: int = 4          # qformer_quantizer.py:177 decode_depth=4
    decode_heads: int = 12
    image_embed_dim: int = 1024    # unCLIP CLIP-ViT-H image embedding dim
    with_recon_blocks: bool = False  # stage-2 training recon_s path (:238-250)
    # distill head variant (qformer_quantizer.py:172 use_qformer_image):
    # False = image_down MLP (inference default / released checkpoint);
    # True  = 1-token Reverse Q-Former (the stage-2 TRAINING default,
    # blip2_qformer_codebook_all_image.py:84,145-157)
    use_qformer_image: bool = False

    @property
    def hidden(self) -> int:
        return self.qformer.hidden

    @property
    def reverse_qformer(self) -> QFormerConfig:
        """1 reverse token cross-attending to the 32 decoded features
        (init_Qformer(num_reverse_token=1, hidden_size), same depth/heads
        as the main Q-Former, encoder_width = hidden)."""
        import dataclasses
        return dataclasses.replace(self.qformer, query_len=1,
                                   encoder_width=self.hidden,
                                   with_text=False)


SEED_TOKENIZER = SeedTokenizerConfig()
TINY_TOKENIZER = SeedTokenizerConfig(
    vit=TINY_VIT,
    qformer=QFormerConfig(hidden=32, layers=2, heads=2, intermediate=64,
                          encoder_width=TINY_VIT.dim, query_len=8),
    codebook_size=64, code_dim=8, decode_depth=2, decode_heads=2,
    image_embed_dim=16)


def _decode_block_cfg(cfg: SeedTokenizerConfig) -> ViTConfig:
    # plain timm-style blocks: full qkv bias, mlp_ratio 4.0, ln eps 1e-6
    # (qformer_quantizer.py:240-264 via seed_qformer/vit.py Block)
    return ViTConfig(dim=cfg.hidden, depth=cfg.decode_depth,
                     heads=cfg.decode_heads, mlp_dim=cfg.hidden * 4,
                     qkv_bias="full", ln_eps=1e-6)


def init_seed_tokenizer(key, cfg: SeedTokenizerConfig = SEED_TOKENIZER,
                        dtype=jnp.float32):
    ks = L.split_keys(key, 12)
    h = cfg.hidden
    params = {
        "vit": init_vit(ks[0], cfg.vit, dtype),
        "ln_vision": L.init_layer_norm(cfg.vit.dim, dtype),
        "qformer": init_qformer(ks[1], cfg.qformer, dtype),
        "encode_task": {
            "fc1": L.init_linear(ks[2], h, h, dtype=dtype),
            "fc2": L.init_linear(ks[3], h, cfg.code_dim, dtype=dtype),
        },
        "vq": VQ.init_codebook(ks[4], cfg.codebook_size, cfg.code_dim, dtype),
        "decode_task": {
            "fc1": L.init_linear(ks[5], cfg.code_dim, cfg.code_dim, dtype=dtype),
            "fc2": L.init_linear(ks[6], cfg.code_dim, h, dtype=dtype),
        },
        "pos_embed_image": jnp.zeros((1, cfg.qformer.query_len, h), dtype),
        "blocks_image": stack_blocks([
            init_block(k, h, h * 4, "full", dtype)
            for k in L.split_keys(ks[7], cfg.decode_depth)]),
    }
    if cfg.use_qformer_image:
        # Reverse Q-Former distill head (training default,
        # blip2_qformer_codebook_all_image.py:145-157): 1 reverse token +
        # proj hidden -> image_embed_dim
        params["reverse_qformer"] = init_qformer(ks[8], cfg.reverse_qformer,
                                                 dtype)
        params["distill_image_proj"] = L.init_linear(
            ks[11], h, cfg.image_embed_dim, dtype=dtype)
    else:
        params["image_down"] = {
            "fc1": L.init_linear(ks[8], h, 256, bias=False, dtype=dtype),
            "fc2": L.init_linear(ks[9], 256, 128, bias=False, dtype=dtype),
            "fc3": L.init_linear(ks[10], 128, 32, bias=False, dtype=dtype),
        }
        params["distill_image_proj"] = L.init_linear(
            ks[11], cfg.qformer.query_len * 32, cfg.image_embed_dim,
            dtype=dtype)
    if cfg.with_recon_blocks:
        kr = jax.random.fold_in(key, 99)
        params["pos_embed"] = jnp.zeros((1, cfg.qformer.query_len, h), dtype)
        params["blocks"] = stack_blocks([
            init_block(k, h, h * 4, "full", dtype)
            for k in L.split_keys(kr, cfg.decode_depth)])
    return params


def quantize_for_serving(params, cfg: SeedTokenizerConfig):
    """bf16/fp32 tokenizer -> W8A8 int8 encoder serving variant.

    Quantizes the four hot matmuls of every EVA-ViT block to int8 weights
    (per-output-channel absmax) and flips ``cfg.vit.w8a8`` so block_apply
    routes them through the int8 MXU path (2x bf16 TOPS on v5e — the
    reference's 8-bit serving mode, configs/llm/seed_llama_8b_8bit.yaml,
    applied to the encoder). Q-Former, VQ distances, norms and the decode
    path are untouched, so token-id drift comes only from the ViT features.
    Returns (quantized_params, new_cfg).
    """
    import dataclasses
    from ..ops.quantization import VIT_TARGETS, quantize_tree
    new = dict(params)
    new["vit"] = quantize_tree(params["vit"], VIT_TARGETS)
    return new, dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, w8a8=True))


def serving_fast_config(cfg: SeedTokenizerConfig):
    """Compose every measured serving-mode encode lever on ``cfg.vit``:

    - ``use_flash``: Pallas short-seq attention (scores stay in VMEM)
    - ``gelu_tanh``: tanh GELU (erf costs ~9% of full encode on the VPU)

    Orthogonal to :func:`quantize_for_serving` (W8A8 — apply both for the
    fastest path). Token-id agreement vs exact bf16 is measured per
    combination in PERF.md / scripts/bench_encode_variants.py; all levers
    stay opt-in so the default path keeps torch parity.
    """
    import dataclasses
    return dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, use_flash=True,
                                     act="gelu_tanh"))


# ------------------------------ encode -------------------------------------

def encode_features(params, images: jnp.ndarray,
                    cfg: SeedTokenizerConfig) -> jnp.ndarray:
    """image -> continuous pre-VQ features z [B, Q, code_dim]."""
    feats = vit_apply(params["vit"], images, cfg.vit)
    feats = L.layer_norm(params["ln_vision"], feats)  # blip2.py:179 fp32 LN
    q = qformer_apply(params["qformer"], feats, cfg.qformer)
    h = jnp.tanh(L.linear(params["encode_task"]["fc1"], q))
    return L.linear(params["encode_task"]["fc2"], h)


def encode(params, images: jnp.ndarray,
           cfg: SeedTokenizerConfig = SEED_TOKENIZER) -> jnp.ndarray:
    """images [B, H, W, 3] (preprocessed) -> token ids int32 [B, Q].

    Equivalent to ImageTokenizer.encode / get_codebook_indices.
    """
    z = encode_features(params, images, cfg)
    return VQ.nearest_codes(params["vq"]["codebook"], z)


# ------------------------------ decode -------------------------------------

def distill_head(params, h: jnp.ndarray,
                 cfg: SeedTokenizerConfig) -> jnp.ndarray:
    """Decoded features [B, Q, hidden] (post blocks_image) -> unCLIP image
    embedding [B, image_embed_dim]. Two reference variants
    (qformer_quantizer.py:309-338 / blip2_qformer_codebook_all_image.py
    :255-269): the 1-token Reverse Q-Former (use_qformer_image=True) or the
    image_down MLP (False, the released-checkpoint inference path)."""
    if cfg.use_qformer_image:
        rev = qformer_apply(params["reverse_qformer"], h, cfg.reverse_qformer)
        return L.linear(params["distill_image_proj"], rev[:, 0])
    h = jax.nn.relu(L.linear(params["image_down"]["fc1"], h))
    h = jax.nn.relu(L.linear(params["image_down"]["fc2"], h))
    h = L.linear(params["image_down"]["fc3"], h)
    h = h.reshape(h.shape[0], -1)
    return L.linear(params["distill_image_proj"], h)


def decode_embedding(params, indices: jnp.ndarray,
                     cfg: SeedTokenizerConfig = SEED_TOKENIZER) -> jnp.ndarray:
    """token ids [B, Q] -> unCLIP image embedding [B, image_embed_dim].

    Equivalent to Blip2QformerQuantizer.get_codebook_entry (:309-338),
    both distill-head variants.
    """
    z_q = VQ.lookup(params["vq"], indices)
    h = jnp.tanh(L.linear(params["decode_task"]["fc1"], z_q))
    h = L.linear(params["decode_task"]["fc2"], h)
    h = h + params["pos_embed_image"].astype(h.dtype)
    h = blocks_apply(params["blocks_image"], h, _decode_block_cfg(cfg))
    return distill_head(params, h, cfg)


def encode_to_embedding(params, images: jnp.ndarray,
                        cfg: SeedTokenizerConfig = SEED_TOKENIZER
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused round trip used by offline pre-tokenization + recon eval."""
    ids = encode(params, images, cfg)
    return ids, decode_embedding(params, ids, cfg)
