"""CLIP text encoder (OpenCLIP ViT-H text tower) for the unCLIP pipeline.

The de-tokenizer always conditions on the empty prompt
(``_encode_prompt("")``, pipeline_stable_unclip_img2img.py:190) — the real
conditioning is the image embedding. We implement the full text tower for
prompt-augmented generation + checkpoint completeness, and support
precomputed prompt embeddings (the common serving path caches the
empty-prompt embedding once).

Arch (stable-diffusion-2-1 text_encoder): vocab 49408, hidden 1024,
23 layers kept (SD2 uses penultimate layer of the 24-layer tower),
heads 16, mlp 4096, causal mask, final LayerNorm, GELU (exact).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...ops.attention import causal_mask, mha
from .. import layers as L


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 1024
    layers: int = 23
    heads: int = 16
    mlp_dim: int = 4096
    max_len: int = 77
    ln_eps: float = 1e-5


SD21_TEXT = CLIPTextConfig()
TINY_TEXT = CLIPTextConfig(vocab_size=64, hidden=16, layers=2, heads=2,
                           mlp_dim=32, max_len=8)


def init_clip_text(key, cfg: CLIPTextConfig = SD21_TEXT, dtype=jnp.float32):
    ks = iter(L.split_keys(key, 8 * cfg.layers + 4))
    layers = []
    for _ in range(cfg.layers):
        layers.append({
            "ln1": L.init_layer_norm(cfg.hidden, dtype),
            "q": L.init_linear(next(ks), cfg.hidden, cfg.hidden, dtype=dtype),
            "k": L.init_linear(next(ks), cfg.hidden, cfg.hidden, dtype=dtype),
            "v": L.init_linear(next(ks), cfg.hidden, cfg.hidden, dtype=dtype),
            "out": L.init_linear(next(ks), cfg.hidden, cfg.hidden, dtype=dtype),
            "ln2": L.init_layer_norm(cfg.hidden, dtype),
            "fc1": L.init_linear(next(ks), cfg.hidden, cfg.mlp_dim, dtype=dtype),
            "fc2": L.init_linear(next(ks), cfg.mlp_dim, cfg.hidden, dtype=dtype),
        })
    return {
        "token_embedding": L.init_embed(next(ks), cfg.vocab_size, cfg.hidden, dtype),
        "position_embedding": L.init_embed(next(ks), cfg.max_len, cfg.hidden, dtype),
        "layers": layers,
        "final_ln": L.init_layer_norm(cfg.hidden, dtype),
    }


def clip_text_apply(params, ids: jnp.ndarray,
                    cfg: CLIPTextConfig = SD21_TEXT) -> jnp.ndarray:
    """ids [B, T] -> hidden states [B, T, hidden] (post final LN)."""
    B, T = ids.shape
    x = L.embed(params["token_embedding"], ids)
    x = x + params["position_embedding"]["embedding"][:T].astype(x.dtype)
    mask = causal_mask(T)
    H, hd = cfg.heads, cfg.hidden // cfg.heads
    for lp in params["layers"]:
        h = L.layer_norm(lp["ln1"], x, cfg.ln_eps)
        q = L.linear(lp["q"], h).reshape(B, T, H, hd)
        k = L.linear(lp["k"], h).reshape(B, T, H, hd)
        v = L.linear(lp["v"], h).reshape(B, T, H, hd)
        o = mha(q, k, v, mask=mask).reshape(B, T, cfg.hidden)
        x = x + L.linear(lp["out"], o)
        h = L.layer_norm(lp["ln2"], x, cfg.ln_eps)
        x = x + L.linear(lp["fc2"], L.gelu(L.linear(lp["fc1"], h)))
    return L.layer_norm(params["final_ln"], x, cfg.ln_eps)
