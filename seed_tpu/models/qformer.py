"""Causal Q-Former — the heart of the SEED-2 visual tokenizer.

Reference semantics (models/seed_qformer/qformer_causual.py):
- 32 learned query tokens attend *causally* among themselves
  (mask ``col <= row`` over the query block, :698-714, triggered when
  query length == 32, :814-816) — this is what makes the 32 visual codes a
  left-to-right sequence a LLM can model.
- Cross-attention from query positions to the frozen ViT output every
  ``cross_freq`` layers (layers 0, 2, 4, ... — BertLayer :341-345).
- Query positions use a *separate* FFN (``intermediate_query`` /
  ``output_query``, :408-422) from text positions.
- Text tokens (stage-1 training) attend bidirectionally to everything;
  queries additionally attend fully to the text suffix (mask :703-714).
- Post-norm residuals (BERT style), LayerNorm eps 1e-12, exact GELU.

TPU-first: the 12 layers are held as an explicit list (they are tiny — 32
tokens x 768 dims — so unrolling beats a scan with layer-heterogeneous
cross-attention), all matmuls batched on the MXU, masks precomputed once.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from . import layers as L


@dataclass(frozen=True)
class QFormerConfig:
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    encoder_width: int = 1408     # ViT feature dim for cross-attention
    cross_freq: int = 2
    query_len: int = 32
    vocab_size: int = 30523       # bert-base-uncased + [DEC] (blip2.py:37-39)
    max_position: int = 512
    ln_eps: float = 1e-12
    with_text: bool = False       # stage-1 training keeps the text pathway

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


SEED_QFORMER = QFormerConfig()
TINY_QFORMER = QFormerConfig(hidden=32, layers=4, heads=2, intermediate=64,
                             encoder_width=48, query_len=8, vocab_size=64,
                             max_position=64)


# ------------------------------ init --------------------------------------

def _init_attn(key, q_in: int, kv_in: int, hidden: int, dtype):
    ks = L.split_keys(key, 4)
    return {
        "q": L.init_linear(ks[0], q_in, hidden, dtype=dtype),
        "k": L.init_linear(ks[1], kv_in, hidden, dtype=dtype),
        "v": L.init_linear(ks[2], kv_in, hidden, dtype=dtype),
        "out": L.init_linear(ks[3], hidden, hidden, dtype=dtype),
        "norm": L.init_layer_norm(hidden, dtype),
    }


def _init_ffn(key, hidden: int, intermediate: int, dtype):
    ks = L.split_keys(key, 2)
    return {
        "fc1": L.init_linear(ks[0], hidden, intermediate, dtype=dtype),
        "fc2": L.init_linear(ks[1], intermediate, hidden, dtype=dtype),
        "norm": L.init_layer_norm(hidden, dtype),
    }


def init_qformer(key, cfg: QFormerConfig, dtype=jnp.float32):
    n_keys = 2 + cfg.layers * 4
    ks = L.split_keys(key, n_keys)
    params = {
        "query_tokens": (jax.random.normal(ks[0], (1, cfg.query_len, cfg.hidden)) * 0.02).astype(dtype),
        "embeddings": {"norm": L.init_layer_norm(cfg.hidden, dtype)},
        "layers": [],
    }
    ki = 2
    for i in range(cfg.layers):
        layer = {
            "self": _init_attn(ks[ki], cfg.hidden, cfg.hidden, cfg.hidden, dtype),
            "ffn_q": _init_ffn(ks[ki + 1], cfg.hidden, cfg.intermediate, dtype),
        }
        if i % cfg.cross_freq == 0:
            layer["cross"] = _init_attn(ks[ki + 2], cfg.hidden,
                                        cfg.encoder_width, cfg.hidden, dtype)
        if cfg.with_text:
            layer["ffn_t"] = _init_ffn(ks[ki + 3], cfg.hidden, cfg.intermediate, dtype)
        ki += 4
        params["layers"].append(layer)
    if cfg.with_text:
        kw, kp = jax.random.split(jax.random.fold_in(key, 7))
        params["embeddings"]["word_embeddings"] = L.init_embed(
            kw, cfg.vocab_size, cfg.hidden, dtype)
        params["embeddings"]["position_embeddings"] = L.init_embed(
            kp, cfg.max_position, cfg.hidden, dtype)
    return params


# ----------------------------- masking ------------------------------------

def seed_causal_mask(query_len: int, text_len: int = 0,
                     text_pad: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """The SEED query-causal mask (qformer_causual.py:698-714).

    Layout [Q | T]: queries attend causally to earlier queries and fully to
    text; text attends to everything (subject to padding). Returns bool
    [B?, 1, Q+T, Q+T] (batched iff ``text_pad`` given).
    """
    n = query_len + text_len
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    in_query_block = (row < query_len) & (col < query_len)
    mask = jnp.where(in_query_block, col <= row, True)
    mask = mask[None, None]  # [1, 1, n, n]
    if text_pad is not None and text_len > 0:
        pad = jnp.concatenate(
            [jnp.ones((text_pad.shape[0], query_len), bool), text_pad.astype(bool)],
            axis=1)
        mask = mask & pad[:, None, None, :]
    return mask


# ----------------------------- forward ------------------------------------

def _attn_apply(p, x_q, x_kv, cfg: QFormerConfig, mask=None):
    B, N, _ = x_q.shape
    M = x_kv.shape[1]
    H, hd = cfg.heads, cfg.head_dim
    q = L.linear(p["q"], x_q).reshape(B, N, H, hd)
    k = L.linear(p["k"], x_kv).reshape(B, M, H, hd)
    v = L.linear(p["v"], x_kv).reshape(B, M, H, hd)
    o = mha(q, k, v, mask=mask).reshape(B, N, cfg.hidden)
    # BertSelfOutput: dense -> residual -> LN (post-norm)
    return L.layer_norm(p["norm"], x_q + L.linear(p["out"], o), cfg.ln_eps)


def _ffn_apply(p, x, cfg: QFormerConfig):
    h = L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], x)))
    return L.layer_norm(p["norm"], x + h, cfg.ln_eps)


def qformer_apply(
    params,
    image_embeds: jnp.ndarray,                 # [B, M, encoder_width]
    cfg: QFormerConfig,
    text_ids: Optional[jnp.ndarray] = None,    # [B, T] (stage-1 training)
    text_pad: Optional[jnp.ndarray] = None,    # [B, T] 1 = real token
) -> jnp.ndarray:
    """Query(+text) forward. Returns hidden states [B, Q(+T), hidden].

    Mirrors Qformer.bert(query_embeds=..., encoder_hidden_states=...)
    (qformer_causual.py:768-915) for the is_casual=True branch.
    """
    B = image_embeds.shape[0]
    Q = cfg.query_len
    x = jnp.broadcast_to(params["query_tokens"], (B, Q, cfg.hidden))
    x = x.astype(image_embeds.dtype)
    T = 0
    if text_ids is not None:
        T = text_ids.shape[1]
        emb = params["embeddings"]
        tok = L.embed(emb["word_embeddings"], text_ids)
        pos = emb["position_embeddings"]["embedding"][:T]
        x = jnp.concatenate([x, (tok + pos).astype(x.dtype)], axis=1)
    x = L.layer_norm(params["embeddings"]["norm"], x, cfg.ln_eps)

    self_mask = seed_causal_mask(Q, T, text_pad)

    for i, layer in enumerate(params["layers"]):
        x = _attn_apply(layer["self"], x, x, cfg, mask=self_mask)
        if "cross" in layer:
            # cross-attention applies to query positions only (BertLayer :393-406)
            xq = _attn_apply(layer["cross"], x[:, :Q], image_embeds, cfg)
            x = jnp.concatenate([xq, x[:, Q:]], axis=1) if T else xq
        xq = _ffn_apply(layer["ffn_q"], x[:, :Q], cfg)
        if T:
            xt = _ffn_apply(layer["ffn_t"], x[:, Q:], cfg)
            x = jnp.concatenate([xq, xt], axis=1)
        else:
            x = xq
    return x


def seed_caption_mask(query_len: int, text_len: int) -> jnp.ndarray:
    """UniLM-style decoder mask (get_extended_attention_mask has_query
    branch, qformer_causual.py:723-748): queries attend causally among
    themselves but NOT to text; text attends to all queries and causally
    to itself. Bool [1, 1, Q+T, Q+T]."""
    n = query_len + text_len
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    causal = col <= row
    query_row_text_col = (row < query_len) & (col >= query_len)
    return (causal & ~query_row_text_col)[None, None]


def qformer_caption_apply(
    params,
    image_embeds: jnp.ndarray,
    text_ids: jnp.ndarray,
    cfg: QFormerConfig,
    text_pad: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decoder-mode forward for the stage-1 captioning loss
    (blip2_qformer_casual.py:275-296 / BertLMHeadModel): queries as a
    visual prefix, text generated left-to-right. Returns text hidden
    states [B, T, hidden]."""
    B = image_embeds.shape[0]
    Q = cfg.query_len
    T = text_ids.shape[1]
    emb = params["embeddings"]
    x_q = jnp.broadcast_to(params["query_tokens"], (B, Q, cfg.hidden))
    tok = L.embed(emb["word_embeddings"], text_ids)
    pos = emb["position_embeddings"]["embedding"][:T]
    x = jnp.concatenate([x_q.astype(tok.dtype), tok + pos.astype(tok.dtype)], 1)
    x = L.layer_norm(emb["norm"], x, cfg.ln_eps)

    mask = seed_caption_mask(Q, T)
    if text_pad is not None:
        pad = jnp.concatenate([jnp.ones((B, Q), bool),
                               text_pad.astype(bool)], axis=1)
        mask = mask & pad[:, None, None, :]

    for i, layer in enumerate(params["layers"]):
        x = _attn_apply(layer["self"], x, x, cfg, mask=mask)
        if "cross" in layer:
            xq = _attn_apply(layer["cross"], x[:, :Q], image_embeds, cfg)
            x = jnp.concatenate([xq, x[:, Q:]], axis=1)
        xq = _ffn_apply(layer["ffn_q"], x[:, :Q], cfg)
        xt = _ffn_apply(layer["ffn_t"], x[:, Q:], cfg)
        x = jnp.concatenate([xq, xt], axis=1)
    return x[:, Q:]


def init_lm_head(key, cfg: QFormerConfig, dtype=jnp.float32):
    """BERT MLM head: transform (dense+gelu+LN) + decoder tied to the word
    embeddings plus a free bias (BertLMHeadModel cls)."""
    return {"transform": L.init_linear(key, cfg.hidden, cfg.hidden, dtype=dtype),
            "norm": L.init_layer_norm(cfg.hidden, dtype),
            "bias": jnp.zeros((cfg.vocab_size,), dtype)}


def lm_head_apply(head, word_embeddings, hidden, cfg: QFormerConfig):
    h = L.gelu(L.linear(head["transform"], hidden))
    h = L.layer_norm(head["norm"], h, cfg.ln_eps)
    logits = h @ word_embeddings["embedding"].astype(h.dtype).T
    return logits + head["bias"].astype(logits.dtype)


def qformer_generate_caption(
    params,
    lm_head,
    image_embeds: jnp.ndarray,
    cfg: QFormerConfig,
    bos_id: int,
    eos_id: int,
    max_len: int = 24,
) -> jnp.ndarray:
    """Greedy caption generation through the decoder-mode Q-Former
    (BertLMHeadModel.generate equivalent, qformer_causual.py:933-1062).

    Fully in-graph (lax.scan over positions with a growing visible prefix
    via masking) — recomputes the joint forward per step, which at 32
    queries + <=max_len text is cheaper than maintaining a BERT KV cache.
    Returns int32 [B, max_len] (eos-padded).
    """
    B = image_embeds.shape[0]

    def step(tokens, i):
        # tokens [B, max_len]; positions > i are padding (masked)
        pad = (jax.lax.broadcasted_iota(jnp.int32, (B, max_len), 1)
               <= i).astype(jnp.int32)
        hidden = qformer_caption_apply(params, image_embeds, tokens, cfg,
                                       text_pad=pad)
        logits = lm_head_apply(lm_head, params["embeddings"]
                               ["word_embeddings"], hidden, cfg)
        nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
        # once eos was produced, keep emitting eos
        prev = tokens[:, i]
        done = prev == eos_id
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, nxt, i + 1, 1)
        return tokens, None

    tokens = jnp.full((B, max_len), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos_id)
    tokens, _ = jax.lax.scan(step, tokens,
                             jnp.arange(max_len - 1, dtype=jnp.int32))
    return tokens


def qformer_caption_prefix(params, image_embeds: jnp.ndarray,
                           cfg: QFormerConfig, max_text: int):
    """KV-cached caption generation, phase 1 (the visual prefix).

    In the UniLM caption mask (seed_caption_mask) query positions NEVER
    attend to text, so their hidden states — and therefore their per-layer
    self-attention K/V — are independent of the generated text. Run the
    query block once (causal self-attn + cross-attn + ffn_q, exactly the
    first-Q-rows restriction of qformer_caption_apply) and bank each
    layer's K/V; text decode then attends into the bank
    (BertLMHeadModel.generate's past_key_values, qformer_causual.py:933-
    1062 + BertSelfAttention past_key_value :214-260).

    Returns a cache: list per layer of {"k","v"} [B, Q+max_text, H, hd]
    with [:Q] filled; text rows are written by qformer_caption_step.
    """
    B = image_embeds.shape[0]
    Q, H, hd = cfg.query_len, cfg.heads, cfg.head_dim
    S = Q + max_text
    x = jnp.broadcast_to(params["query_tokens"], (B, Q, cfg.hidden))
    x = L.layer_norm(params["embeddings"]["norm"],
                     x.astype(image_embeds.dtype), cfg.ln_eps)
    qmask = seed_causal_mask(Q)          # queries causal among themselves

    cache = []
    for layer in params["layers"]:
        p = layer["self"]
        k = L.linear(p["k"], x).reshape(B, Q, H, hd)
        v = L.linear(p["v"], x).reshape(B, Q, H, hd)
        buf_k = jnp.zeros((B, S, H, hd), x.dtype).at[:, :Q].set(k)
        buf_v = jnp.zeros((B, S, H, hd), x.dtype).at[:, :Q].set(v)
        cache.append({"k": buf_k, "v": buf_v})
        q = L.linear(p["q"], x).reshape(B, Q, H, hd)
        o = mha(q, k, v, mask=qmask).reshape(B, Q, cfg.hidden)
        x = L.layer_norm(p["norm"], x + L.linear(p["out"], o), cfg.ln_eps)
        if "cross" in layer:
            x = _attn_apply(layer["cross"], x, image_embeds, cfg)
        x = _ffn_apply(layer["ffn_q"], x, cfg)
    return cache


def qformer_caption_step(params, cache, tok: jnp.ndarray, i,
                         cfg: QFormerConfig):
    """KV-cached caption decode, phase 2: one text token.

    ``tok`` [B] is the token at text position ``i`` (traced int32). Writes
    its K/V into cache row Q+i and returns (hidden [B, hidden], cache).
    Text positions have no cross-attention and use the text FFN
    (qformer_caption_apply rows [Q:]).
    """
    B = tok.shape[0]
    Q, H, hd = cfg.query_len, cfg.heads, cfg.head_dim
    S = cache[0]["k"].shape[1]
    emb = params["embeddings"]
    x = (L.embed(emb["word_embeddings"], tok[:, None])
         + emb["position_embeddings"]["embedding"][i][None, None])
    x = L.layer_norm(emb["norm"], x, cfg.ln_eps)       # [B, 1, hidden]

    # visible: all queries + text rows <= i (absolute rows < Q+i+1)
    visible = (jnp.arange(S) < Q + i + 1)[None, None, None, :]
    new_cache = []
    for layer, lc in zip(params["layers"], cache):
        p = layer["self"]
        k1 = L.linear(p["k"], x).reshape(B, 1, H, hd)
        v1 = L.linear(p["v"], x).reshape(B, 1, H, hd)
        bk = jax.lax.dynamic_update_slice(
            lc["k"], k1.astype(lc["k"].dtype), (0, Q + i, 0, 0))
        bv = jax.lax.dynamic_update_slice(
            lc["v"], v1.astype(lc["v"].dtype), (0, Q + i, 0, 0))
        new_cache.append({"k": bk, "v": bv})
        q = L.linear(p["q"], x).reshape(B, 1, H, hd)
        o = mha(q, bk, bv, mask=visible).reshape(B, 1, cfg.hidden)
        x = L.layer_norm(p["norm"], x + L.linear(p["out"], o), cfg.ln_eps)
        x = _ffn_apply(layer["ffn_t"], x, cfg)
    return x[:, 0], new_cache


def qformer_generate_caption_cached(
    params,
    lm_head,
    image_embeds: jnp.ndarray,
    cfg: QFormerConfig,
    bos_id: int,
    eos_id: int,
    max_len: int = 24,
) -> jnp.ndarray:
    """Greedy caption generation with the banked-prefix KV cache — same
    tokens as qformer_generate_caption (both greedy over the same math)
    at O(1) instead of O(Q+T) positions per step. Returns [B, max_len]."""
    B = image_embeds.shape[0]
    cache = qformer_caption_prefix(params, image_embeds, cfg, max_len)
    word = params["embeddings"]["word_embeddings"]

    def step(carry, i):
        tokens, cache = carry
        tok_i = jax.lax.dynamic_index_in_dim(tokens, i, 1, keepdims=False)
        hidden, cache = qformer_caption_step(params, cache, tok_i, i, cfg)
        logits = lm_head_apply(lm_head, word, hidden[:, None], cfg)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        prev = jax.lax.dynamic_index_in_dim(tokens, i, 1, keepdims=False)
        nxt = jnp.where(prev == eos_id, eos_id, nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, i + 1, 1)
        return (tokens, cache), None

    tokens = jnp.full((B, max_len), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(bos_id)
    (tokens, _), _ = jax.lax.scan(
        step, (tokens, cache), jnp.arange(max_len - 1, dtype=jnp.int32))
    return tokens


def qformer_text_apply(
    params,
    text_ids: jnp.ndarray,                  # [B, T]
    cfg: QFormerConfig,
    text_pad: Optional[jnp.ndarray] = None,  # [B, T] 1 = real token
) -> jnp.ndarray:
    """Text-only BERT forward (stage-1 text encoding:
    blip2_qformer_casual.py:152-158 Qformer.bert(input_ids, attention_mask)).
    Bidirectional self-attention with padding mask; text FFN; no cross-attn.
    Returns hidden states [B, T, hidden] (CLS at position 0).
    """
    B, T = text_ids.shape
    emb = params["embeddings"]
    tok = L.embed(emb["word_embeddings"], text_ids)
    pos = emb["position_embeddings"]["embedding"][:T]
    x = L.layer_norm(emb["norm"], tok + pos.astype(tok.dtype), cfg.ln_eps)

    mask = None
    if text_pad is not None:
        mask = text_pad.astype(bool)[:, None, None, :]
    for layer in params["layers"]:
        x = _attn_apply(layer["self"], x, x, cfg, mask=mask)
        x = _ffn_apply(layer["ffn_t"], x, cfg)
    return x
