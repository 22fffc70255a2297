"""Attention ops.

``mha`` is the XLA-fused reference path (einsum + softmax — XLA fuses the
mask/softmax chain into the matmuls well at these sizes). The Pallas
flash-attention kernel in ``seed_tpu.ops.flash_attention`` replaces it for
long-sequence training/prefill; ``dispatch_attention`` picks per shape.

This subsumes the reference's xformers memory-efficient attention
(models/llama_xformer.py:244-255) and flash-attn-2
(MultiModalLLM/src/model/modeling_llama_4_35_0.py:415-576).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative in fp32; avoids bf16 overflow vs -10000 hack


def mha(
    q: jnp.ndarray,           # [B, N, H, D]
    k: jnp.ndarray,           # [B, M, H_kv, D]
    v: jnp.ndarray,           # [B, M, H_kv, D]
    mask: Optional[jnp.ndarray] = None,   # broadcastable to [B, H, N, M]; True = attend
    bias: Optional[jnp.ndarray] = None,   # additive bias, same broadcast
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head attention with fp32 softmax. Supports GQA (H_kv divides H)."""
    B, N, H, D = q.shape
    h_kv = k.shape[2]
    if h_kv != H:  # grouped-query: repeat kv heads
        rep = H // h_kv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = scale if scale is not None else D ** -0.5

    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def causal_mask(n: int, m: Optional[int] = None, dtype=jnp.bool_) -> jnp.ndarray:
    """[1, 1, n, m] lower-triangular mask (True = attend)."""
    m = m if m is not None else n
    row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return (col <= row + (m - n)).astype(dtype)[None, None]


def decode_mask(kv_len: int, cache_index: jnp.ndarray) -> jnp.ndarray:
    """[1, 1, 1, kv_len] mask for single-token decode over a ring KV cache:
    positions <= cache_index are valid."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, kv_len), 1)
    return (col <= cache_index)[None, None]


def sliced_causal_mask(q_len: int, kv_len: int, q_offset: jnp.ndarray) -> jnp.ndarray:
    """Causal mask for a query chunk starting at ``q_offset`` within a longer
    preallocated KV buffer (continuous batching / chunked prefill)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
    return (col <= row + q_offset)[None, None]
