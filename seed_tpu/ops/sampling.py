"""Token sampling: temperature / top-k / top-p (nucleus) / greedy.

Replaces the HF GenerationMixin sampling path used by the reference
(scripts/seed_llama_inference_8B.py:81-87: do_sample, temperature, top_p).
Runs entirely on device and jit-compiles into the decode step.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering, HF semantics: keep the smallest set of tokens with
    cumulative probability > p (the first token crossing p is kept)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < p          # token included before crossing p
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample(
    key: jax.Array,
    logits: jnp.ndarray,            # [B, V]
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    do_sample: bool = True,
) -> jnp.ndarray:
    """-> int32 [B]."""
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k:
        logits = apply_top_k(logits, top_k)
    if top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def apply_top_p_rowwise(logits: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus filtering with a per-row ``p`` [B]. Rows with p >= 1 keep
    every token (threshold degenerates to the min logit)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < p[:, None]
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def sample_batched(
    key: jax.Array,
    logits: jnp.ndarray,            # [B, V]
    temperature: jnp.ndarray,       # [B] float32
    top_p: jnp.ndarray,             # [B] float32
    greedy: jnp.ndarray,            # [B] bool — rows taking argmax
    top_k: int = 0,                 # static, shared across rows (0 = off)
) -> jnp.ndarray:
    """Per-row sampling for continuous batching: every request slot can
    carry its own temperature/top_p/greedy flag inside ONE compiled
    program (only top_k must be shared — its k is a static shape).

    -> int32 [B]."""
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    if top_k:
        scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p_rowwise(scaled, top_p)
    samp = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(greedy, arg, samp)
