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


def apply_top_p(logits: jnp.ndarray, p: float,
                candidates: int = 0) -> jnp.ndarray:
    """Nucleus filtering, HF semantics: keep the smallest set of tokens with
    cumulative probability > p (the first token crossing p is kept).

    ``candidates`` > 0 replaces the full-vocabulary sort (a multi-pass
    bitonic network over [B, 40320] — measured ~2.3 ms/step of the 8B
    decode) with ``lax.top_k(candidates)``: probabilities are still exact
    (normalized via logsumexp over the FULL vocabulary), so the result is
    identical whenever the nucleus lies inside the top ``candidates``
    tokens — true for any p < 1 - tail_mass(candidates), i.e. always in
    practice for trained models at p <= 0.95 with candidates >= 2048. If
    the nucleus is wider (near-uniform logits), filtering degrades
    gracefully to keeping exactly the top ``candidates`` tokens."""
    if candidates and candidates < logits.shape[-1]:
        vals, _ = jax.lax.top_k(logits, candidates)   # sorted descending
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(vals - lse)                   # exact full-softmax
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < p
        # smallest kept logit; >= 1 token always kept (cum-probs < p at 0)
        thresh = jnp.min(jnp.where(keep_sorted, vals, jnp.inf),
                         axis=-1, keepdims=True)
        return jnp.where(logits < thresh, NEG_INF, logits)
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
    top_p_candidates: int = 0,      # 0 = exact full-vocab sort
) -> jnp.ndarray:
    """-> int32 [B].

    ``top_p_candidates`` stays 0 by default: standalone the top_k path
    is mildly faster (1.9 vs 2.3 ms at [32, 40320]), but INSIDE the
    jitted decode scan it regressed the whole 8B step 5x (902 -> 171
    tok/s, XLA buffer-assignment interaction — see PERF.md round 2).
    """
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(temperature, 1e-6)
    if top_k:
        logits = apply_top_k(logits, top_k)
    if top_p < 1.0:
        logits = apply_top_p(logits, top_p, candidates=top_p_candidates)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def apply_top_p_rowwise(logits: jnp.ndarray, p: jnp.ndarray,
                        candidates: int = 0) -> jnp.ndarray:
    """Nucleus filtering with a per-row ``p`` [B]. Rows with p >= 1 keep
    every token (threshold degenerates to the min logit). ``candidates``
    as in :func:`apply_top_p`; rows with p >= 1 keep every token on
    both paths."""
    if candidates and candidates < logits.shape[-1]:
        vals, _ = jax.lax.top_k(logits, candidates)
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(vals - lse)
        cum = jnp.cumsum(probs, axis=-1)
        keep_sorted = cum - probs < p[:, None]
        thresh = jnp.min(jnp.where(keep_sorted, vals, jnp.inf),
                         axis=-1, keepdims=True)
        thresh = jnp.where(p[:, None] >= 1.0, -jnp.inf, thresh)
        return jnp.where(logits < thresh, NEG_INF, logits)
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
    top_p_candidates: int = 0,      # 0 = exact full-vocab sort
) -> jnp.ndarray:
    """Per-row sampling for continuous batching: every request slot can
    carry its own temperature/top_p/greedy flag inside ONE compiled
    program (only top_k must be shared — its k is a static shape).

    ``key`` is either ONE uint32[2] key (one gumbel draw covers all rows)
    or PER-ROW keys uint32[B, 2] — per-row keys make each slot's sampling
    stream a function of its own request only, so a seeded request
    reproduces exactly under any concurrent slot mix.

    -> int32 [B]."""
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    if top_k:
        scaled = apply_top_k(scaled, top_k)
    scaled = apply_top_p_rowwise(scaled, top_p, candidates=top_p_candidates)
    if key.ndim == 2:               # per-row keys [B, 2]
        samp = jax.vmap(lambda k, l: jax.random.categorical(k, l))(
            key, scaled).astype(jnp.int32)
    else:
        samp = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(greedy, arg, samp)
