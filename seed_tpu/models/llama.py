"""LLaMA decoder for SEED-LLaMA, TPU-first.

Functional rebuild of the reference's forked HF LLaMA
(models/llama_xformer.py:447-799 and
MultiModalLLM/src/model/modeling_llama_4_35_0.py): RMSNorm, rotary
embeddings (half-split/NeoX convention, matching HF rotate_half), SwiGLU
MLP, optional GQA (repeat_kv :255), causal attention, and a
vocabulary extended with 8192 image codes + BOI/EOI
(train.py:128 resize_token_embeddings).

TPU-first design (NOT a translation):
- The KV cache is a *preallocated ring buffer* [L, B, S_max, H_kv, 2*D]
  (k and v fused — see KVCache) updated with dynamic_update_slice — the
  reference reallocates with torch.cat every step
  (llama_xformer.py:235-240), an O(T) copy that XLA's static shapes both
  forbid and obviate.
- Layers are stacked and applied with lax.scan (one compiled block, 32-40x
  smaller HLO); the cache scans along its leading layer axis in the same
  pass.
- Embedding/vocab padded to a multiple of 128 so the lm_head matmul tiles
  the MXU exactly; logits for padding ids are masked to -inf.
- All matmuls bf16 with fp32 accumulation; RMSNorm + softmax + rope in fp32.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, mha, sliced_causal_mask
from . import layers as L


def pad_vocab(n: int, multiple: int = 128) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 40194        # 32000 text + 8192 image codes + BOI/EOI
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 32             # < heads => GQA
    ffn_dim: int = 11008
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6          # vicuna-7b (llama1); llama2 uses 1e-5
    # context extension (modeling_llama_4_35_0.py:145-187):
    # "linear" divides positions by the factor; "ntk" rescales theta
    rope_scaling: Optional[str] = None
    rope_scaling_factor: float = 1.0
    # W8A8 serving: dynamic per-token int8 activations x int8 weights on
    # the int8 MXU path. Decode is HBM-bound on the weight stream — the
    # int8 x int8 dot reads weights as int8 with NO bf16 conversion in the
    # stream, where the weight-only path's bf16 x convert(int8) dot makes
    # XLA materialize converted tiles (measured: the 2.4x/layer residue,
    # PERF.md round 2-3). Lossy (activation quantization error) — serving
    # opt-in, token agreement measured like the encoder's W8A8 mode.
    w8a8: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads

    @property
    def padded_vocab(self) -> int:
        return pad_vocab(self.vocab_size)


# Vicuna-7B backbone of SEED-LLaMA-8B (configs/llm/seed_llama_8b.yaml)
SEED_LLAMA_8B = LlamaConfig()
# LLaMA2-13B backbone of SEED-LLaMA-14B
SEED_LLAMA_14B = LlamaConfig(dim=5120, layers=40, heads=40, kv_heads=40,
                             ffn_dim=13824, rms_eps=1e-5)
TINY_LLAMA = LlamaConfig(vocab_size=270, dim=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, max_seq_len=128)
# ~0.4B "real-shape" config: full SEED vocabulary + the 8B layer anatomy
# at reduced width/depth — single-chip convergence smokes through the
# REAL data path (scripts/train_llm.py --model small)
SMALL_LLAMA = LlamaConfig(vocab_size=40194, dim=1024, layers=8, heads=8,
                          kv_heads=8, ffn_dim=2816, max_seq_len=1024)


class KVCache(NamedTuple):
    """Preallocated ring KV cache, k and v FUSED into one buffer
    (k = kv[..., :D], v = kv[..., D:]).

    Why fused: XLA's while-loop buffer aliasing keeps ONE donated carry
    array in place, but with k and v as two separate large carry buffers it
    conservatively double-buffers them — measured +1x cache HBM inside
    ``decode_loop`` (nested scan) at every probe shape, and 0 bytes with
    the fused layout. Fusing also halves the number of HBM streams the
    decode attention touches.

    Quantized modes — both halve cache HBM (2x batch or context on one
    16GB chip):

    - **fp8 (``init_cache(dtype=jnp.float8_e4m3fn)``) — the serving
      default.** Scale-free: rides the exact bf16 code path (astype on
      write, astype on read) and therefore keeps the 2-element scan
      carry XLA aliases in place — decode stays at bf16 speed with half
      the cache bytes. e4m3's 3-bit mantissa is coarser than int8
      absmax but k/v values are O(1-10), well inside e4m3 range.
    - int8 (``dtype=jnp.int8``): codes + per-(token, head, k|v-half)
      fp32 absmax ``scale``. More precise, but the separate scale
      buffer forces a THREE-element scan carry, which breaks XLA's
      in-place cache aliasing in the nested decode scan (measured 7x:
      238 ms/step vs 34.5 bf16/fp8 at 8B B=32 — PERF.md round 3).
      Use when cache precision matters more than decode speed.

    Logical axis order [L, S, H_kv, B, 2D] (batch NEXT-TO-MINOR, not
    leading): at 8B decode shapes XLA's layout assignment wants the cache
    physically as [L, S, H, B, 2D] — with the old [L, B, S, H, 2D]
    logical order it materialized ~9.25G of relayout copies at decode-
    loop entry (PERF.md round 2; the AUTO-layout route that also removes
    them cannot execute through the axon tunnel). Making the logical
    order MATCH the preferred physical order gives the no-copy layout
    with default (descending row-major) layouts everywhere. The cached
    attention contracts directly in this layout (``_cached_attn``)."""
    kv: jnp.ndarray       # [L, S_max, H_kv, B, 2*D] bf16 — or int8 codes
    valid: jnp.ndarray    # [B, S_max] bool — slots holding real tokens
    index: jnp.ndarray    # scalar int32: write cursor (tokens written so far)
    scale: Optional[jnp.ndarray] = None  # [L, S_max, H_kv, B, 2] f32 (int8)

    @property
    def k(self) -> jnp.ndarray:   # convenience views (tests/debug)
        return _cache_kv_dequant(self.kv, self.scale)[0]

    @property
    def v(self) -> jnp.ndarray:
        return _cache_kv_dequant(self.kv, self.scale)[1]


def _cache_kv_quant(kv: jnp.ndarray):
    """[..., 2*D] float k|v -> (int8 codes, [..., 2] f32 scales): separate
    per-vector absmax for the k and v halves."""
    D2 = kv.shape[-1]
    halves = kv.astype(jnp.float32).reshape(*kv.shape[:-1], 2, D2 // 2)
    absmax = jnp.max(jnp.abs(halves), axis=-1)                # [..., 2]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(halves / scale[..., None]), -127, 127)
    return q.astype(jnp.int8).reshape(kv.shape), scale


def _cache_kv_dequant(kv: jnp.ndarray, scale: Optional[jnp.ndarray],
                      dtype=jnp.bfloat16):
    """Fused cache buffer (+ scales when int8) -> (k, v) in ``dtype``."""
    hd = kv.shape[-1] // 2
    if scale is None:
        return kv[..., :hd].astype(dtype), kv[..., hd:].astype(dtype)
    k = kv[..., :hd].astype(jnp.float32) * scale[..., 0:1]
    v = kv[..., hd:].astype(jnp.float32) * scale[..., 1:2]
    return k.astype(dtype), v.astype(dtype)


def init_cache(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None,
               dtype=jnp.bfloat16) -> KVCache:
    S = max_len or cfg.max_seq_len
    shape = (cfg.layers, S, cfg.kv_heads, batch, 2 * cfg.head_dim)
    scale = None
    if dtype == jnp.int8:
        scale = jnp.zeros(shape[:-1] + (2,), jnp.float32)
    return KVCache(jnp.zeros(shape, dtype),
                   jnp.zeros((batch, S), jnp.bool_),
                   jnp.zeros((), jnp.int32), scale)


# ------------------------------ init --------------------------------------

def _init_layer(key, cfg: LlamaConfig, dtype):
    ks = L.split_keys(key, 7)
    d, hd = cfg.dim, cfg.head_dim
    kv_out = cfg.kv_heads * hd
    return {
        "input_layernorm": L.init_rms_norm(d, dtype),
        "q_proj": L.init_linear(ks[0], d, d, bias=False, dtype=dtype),
        "k_proj": L.init_linear(ks[1], d, kv_out, bias=False, dtype=dtype),
        "v_proj": L.init_linear(ks[2], d, kv_out, bias=False, dtype=dtype),
        "o_proj": L.init_linear(ks[3], d, d, bias=False, dtype=dtype),
        "post_attention_layernorm": L.init_rms_norm(d, dtype),
        "gate_proj": L.init_linear(ks[4], d, cfg.ffn_dim, bias=False, dtype=dtype),
        "up_proj": L.init_linear(ks[5], d, cfg.ffn_dim, bias=False, dtype=dtype),
        "down_proj": L.init_linear(ks[6], cfg.ffn_dim, d, bias=False, dtype=dtype),
    }


def init_llama(key, cfg: LlamaConfig, dtype=jnp.bfloat16):
    ks = L.split_keys(key, cfg.layers + 3)
    from .vit import stack_blocks
    return {
        "embed_tokens": L.init_embed(ks[0], cfg.padded_vocab, cfg.dim, dtype),
        "layers": stack_blocks([_init_layer(ks[1 + i], cfg, dtype)
                                for i in range(cfg.layers)]),
        "norm": L.init_rms_norm(cfg.dim, dtype),
        "lm_head": L.init_linear(ks[-1], cfg.dim, cfg.padded_vocab,
                                 bias=False, dtype=dtype),
    }


# ------------------------------ rope ---------------------------------------

def rope(x: jnp.ndarray, positions: jnp.ndarray,
         theta: float = 10000.0, scaling: Optional[str] = None,
         factor: float = 1.0) -> jnp.ndarray:
    """Rotary embedding, half-split pairing (HF llama rotate_half).

    x [B, N, H, D], positions [B, N] or [N]. ``scaling`` implements the
    HF context-extension variants (modeling_llama_4_35_0.py:145-187):
    linear = position interpolation; ntk = dynamic base rescale."""
    D = x.shape[-1]
    if scaling == "ntk" and factor != 1.0:
        theta = theta * (factor ** (D / max(1, D - 2)))
    inv = 1.0 / (theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    pos = positions.astype(jnp.float32)
    if scaling == "linear" and factor != 1.0:
        pos = pos / factor
    if pos.ndim == 1:
        pos = pos[None, :]
    freqs = pos[..., None] * inv          # [B, N, D/2]
    cos = jnp.cos(freqs)[:, :, None, :]
    sin = jnp.sin(freqs)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# ----------------------------- layer forward -------------------------------

def _lin(p, x, cfg: LlamaConfig):
    """cfg.w8a8 routes int8-quantized projections through the int8 MXU
    dot (weights stream as int8); otherwise the weight-only/bf16 path."""
    if cfg.w8a8 and "kernel_q" in p:
        return L.linear_w8a8(p, x)
    return L.linear(p, x)


def _attn_qkv(p, x, positions, cfg: LlamaConfig):
    """Shared front half of EVERY decoder-layer variant (batch forward,
    ring-cache prefill, all slot paths): pre-LN + q/k/v projections +
    RoPE. One body — cache-write/attention strategy is what varies per
    path, not this. w8a8-aware via :func:`_lin`."""
    B, N, _ = x.shape
    hd = cfg.head_dim
    h = L.rms_norm(p["input_layernorm"], x, cfg.rms_eps)
    q = _lin(p["q_proj"], h, cfg).reshape(B, N, cfg.heads, hd)
    k = _lin(p["k_proj"], h, cfg).reshape(B, N, cfg.kv_heads, hd)
    v = _lin(p["v_proj"], h, cfg).reshape(B, N, cfg.kv_heads, hd)
    q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling,
             cfg.rope_scaling_factor)
    k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling,
             cfg.rope_scaling_factor)
    return q, k, v


def _attn_out_mlp(p, x, o, cfg: LlamaConfig):
    """Shared back half of every decoder-layer variant: o_proj residual +
    post-LN + SwiGLU MLP. ``o`` is the attention output, any shape
    reshapeable to [B, N, dim]."""
    B, N, _ = x.shape
    x = x + _lin(p["o_proj"], o.reshape(B, N, cfg.dim), cfg)
    h = L.rms_norm(p["post_attention_layernorm"], x, cfg.rms_eps)
    gate = jax.nn.silu(_lin(p["gate_proj"], h, cfg))
    return x + _lin(p["down_proj"], gate * _lin(p["up_proj"], h, cfg), cfg)


def _layer_apply(p, x, positions, mask, cfg: LlamaConfig,
                 layer_cache=None, cache_index=None, use_flash=False,
                 attn_fn=None):
    """One decoder layer. Returns (x, new_layer_cache or None).

    ``attn_fn(q, k, v) -> [B, N, H, D]`` overrides the cache-less attention
    (sequence-parallel ring attention injects itself here)."""
    B, N, d = x.shape
    q, k, v = _attn_qkv(p, x, positions, cfg)

    if layer_cache is not None:
        ckv, cscale = layer_cache               # [S, H_kv, B, 2D] fused
        # chunk -> cache layout: [B, N, H, 2D] -> [N, H, B, 2D]
        kv_new = jnp.concatenate([k, v], axis=-1).transpose(1, 2, 0, 3)
        if cscale is not None:                  # int8 cache: quantize write
            kv_q, sc_new = _cache_kv_quant(kv_new)
            ckv = jax.lax.dynamic_update_slice(ckv, kv_q,
                                               (cache_index, 0, 0, 0))
            cscale = jax.lax.dynamic_update_slice(cscale, sc_new,
                                                  (cache_index, 0, 0, 0))
        else:
            ckv = jax.lax.dynamic_update_slice(
                ckv, kv_new.astype(ckv.dtype), (cache_index, 0, 0, 0))
        o = _cached_attn(q, ckv, cscale, mask, cfg)
        return _attn_out_mlp(p, x, o, cfg), (ckv, cscale)

    if attn_fn is not None:
        o = attn_fn(q, k, v)
    elif use_flash:
        # training path: Pallas flash attention (O(S) memory). Right-padded
        # batches are safe under pure causal masking — real tokens never
        # attend forward into padding; pad positions carry no loss.
        from ..ops.flash_attention import flash_attention
        o = flash_attention(q, k, v, causal=True)
    else:
        o = mha(q, k, v, mask=mask)
    return _attn_out_mlp(p, x, o, cfg), None


def _cached_attn(q: jnp.ndarray, ckv: jnp.ndarray,
                 cscale: Optional[jnp.ndarray], mask, cfg: LlamaConfig
                 ) -> jnp.ndarray:
    """Attention over the cache IN ITS STORAGE LAYOUT [S, H_kv, B, 2D] —
    no transposes of cache-sized tensors (the relayout copies those imply
    were the round-2 decode bottleneck). q [B, N, H, D]; mask
    broadcastable to [B, 1, N, S]; fp32 scores/softmax (mha numerics).
    GQA: query heads grouped [H_kv, G] against the shared kv head."""
    from ..ops.attention import NEG_INF
    B, N, H, D = q.shape
    Hkv = ckv.shape[1]
    G = H // Hkv
    k, v = _cache_kv_dequant(ckv, cscale, q.dtype)     # [S, H_kv, B, D]
    qg = q.reshape(B, N, Hkv, G, D)
    scores = jnp.einsum("bnkgd,skbd->bkgns", qg, k,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    if mask is not None:
        scores = jnp.where(mask[:, :, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    o = jnp.einsum("bkgns,skbd->bnkgd", probs, v)
    return o.reshape(B, N, H * D)


def _logits(params, x, cfg: LlamaConfig) -> jnp.ndarray:
    x = L.rms_norm(params["norm"], x, cfg.rms_eps)
    logits = _lin(params["lm_head"], x, cfg).astype(jnp.float32)
    if cfg.padded_vocab != cfg.vocab_size:  # mask vocab padding
        n = cfg.padded_vocab - cfg.vocab_size
        pad = jnp.full((n,), NEG_INF, jnp.float32)
        logits = logits.at[..., cfg.vocab_size:].set(pad)
    return logits


# ----------------------------- public API ----------------------------------

def forward(params, input_ids: jnp.ndarray, cfg: LlamaConfig,
            positions: Optional[jnp.ndarray] = None,
            attn_mask: Optional[jnp.ndarray] = None,
            remat: bool = False, use_flash: bool = False,
            attn_fn=None) -> jnp.ndarray:
    """Training/eval forward over a full sequence -> logits [B, N, V].

    ``attn_mask`` [B, N] (1 = real token) combines with the causal mask —
    matching LlamaModel.forward (llama_xformer.py:496-560).
    ``use_flash`` routes attention through the Pallas flash kernel
    (right-padding assumed; attn_mask then only affects the loss side).
    ``attn_fn`` replaces attention entirely (e.g. sequence-parallel ring
    attention, which owns its own causal masking across shards).
    """
    B, N = input_ids.shape
    x = L.embed(params["embed_tokens"], input_ids)
    if positions is None:
        positions = jnp.arange(N, dtype=jnp.int32)
    if attn_fn is not None:
        if attn_mask is not None:
            raise ValueError(
                "attn_fn owns masking entirely (sequence-parallel shards "
                "cannot see a global [B, N] mask); fold padding into the "
                "loss labels instead of passing attn_mask with attn_fn")
        mask = None   # attn_fn owns masking (N here is a sequence SHARD)
    else:
        mask = sliced_causal_mask(N, N, 0)
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :].astype(bool)

    if remat:
        body = jax.checkpoint(
            lambda p, xx: _layer_apply(p, xx, positions, mask, cfg,
                                       use_flash=use_flash,
                                       attn_fn=attn_fn)[0])

        def step(carry, lp):
            return body(lp, carry), None
    else:
        def step(carry, lp):
            return _layer_apply(lp, carry, positions, mask, cfg,
                                use_flash=use_flash, attn_fn=attn_fn)[0], None

    x, _ = jax.lax.scan(step, x, params["layers"])
    return _logits(params, x, cfg)


def prefill(params, input_ids: jnp.ndarray, cache: KVCache,
            cfg: LlamaConfig,
            chunk_mask: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, KVCache]:
    """Write a chunk into the cache at cache.index; return the chunk's
    logits and the updated cache.

    Left-padding-aware and fully in-graph: ``chunk_mask`` [B, N] marks real
    tokens of this chunk; RoPE positions are derived from the number of
    real tokens already cached per row (the HF position_ids = cumsum(mask)
    convention), and attention only sees valid cache slots. Decode is the
    N=1 special case, so continuous batching reuses one compiled program.
    """
    B, N = input_ids.shape
    S = cache.kv.shape[1]
    if chunk_mask is None:
        chunk_mask = jnp.ones((B, N), jnp.int32)
    chunk_mask = chunk_mask.astype(jnp.int32)

    x = L.embed(params["embed_tokens"], input_ids)
    prior = jnp.sum(cache.valid, axis=1, dtype=jnp.int32)            # [B]
    positions = prior[:, None] + jnp.cumsum(chunk_mask, axis=1) - 1  # [B, N]
    positions = jnp.maximum(positions, 0)

    new_valid = jax.lax.dynamic_update_slice(
        cache.valid, chunk_mask.astype(bool), (0, cache.index))
    causal = sliced_causal_mask(N, S, cache.index)                   # [1,1,N,S]
    mask = causal & new_valid[:, None, None, :]

    # The FUSED kv cache rides the scan CARRY (not xs/ys): with donated
    # inputs XLA keeps ONE cache buffer alive and updates slices in place.
    # Two separate k/v carry buffers (or xs/ys stacking) each cost an extra
    # full cache copy in HBM — see KVCache docstring / PERF.md.
    L_ = cache.kv.shape[0]
    quantized = cache.scale is not None

    if quantized:
        def step(carry, inputs):
            h, kv_all, sc_all = carry
            lp, i = inputs
            h, (ckv, csc) = _layer_apply(
                lp, h, positions, mask, cfg,
                layer_cache=(kv_all[i], sc_all[i]),
                cache_index=cache.index)
            kv_all = jax.lax.dynamic_update_index_in_dim(kv_all, ckv, i, 0)
            sc_all = jax.lax.dynamic_update_index_in_dim(sc_all, csc, i, 0)
            return (h, kv_all, sc_all), None

        (x, kv_new, sc_new), _ = jax.lax.scan(
            step, (x, cache.kv, cache.scale),
            (params["layers"], jnp.arange(L_, dtype=jnp.int32)))
        new_cache = KVCache(kv_new, new_valid, cache.index + N, sc_new)
    else:
        # bf16 path keeps the EXACT round-1 two-element carry: adding even
        # a dummy third carry was measured to break XLA's in-place cache
        # aliasing in the nested decode_loop scan (7.5x decode regression)
        def step(carry, inputs):
            h, kv_all = carry
            lp, i = inputs
            h, (ckv, _) = _layer_apply(lp, h, positions, mask, cfg,
                                       layer_cache=(kv_all[i], None),
                                       cache_index=cache.index)
            kv_all = jax.lax.dynamic_update_index_in_dim(kv_all, ckv, i, 0)
            return (h, kv_all), None

        (x, kv_new), _ = jax.lax.scan(
            step, (x, cache.kv),
            (params["layers"], jnp.arange(L_, dtype=jnp.int32)))
        new_cache = KVCache(kv_new, new_valid, cache.index + N, None)
    return _logits(params, x, cfg), new_cache


def decode_step(params, input_ids: jnp.ndarray, cache: KVCache,
                cfg: LlamaConfig) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step: ids [B, 1] -> logits [B, 1, V] + new cache."""
    return prefill(params, input_ids, cache, cfg)


def decode_loop(params, tok: jnp.ndarray, cache: KVCache, key: jax.Array,
                cfg: LlamaConfig, *, steps: int, temperature: float = 1.0,
                top_p: float = 1.0, top_k: int = 0, do_sample: bool = True,
                eos_id: int = 2
                ) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache, jax.Array]:
    """``steps`` decode+sample iterations in ONE compiled program.

    The reference's HF generate loop (llama_xformer.py:745 +
    seed_llama_inference_8B.py:28-37) round-trips to the host every token;
    here sampling lives in-graph and a lax.scan runs ``steps`` tokens per
    dispatch — on the axon tunnel (or any remote runtime) this amortizes
    the per-dispatch latency ``steps``-fold.

    ``tok`` [B] is the previously sampled token (not yet decoded). Rows
    that hit ``eos_id`` keep decoding in lockstep but their subsequent
    outputs are pinned to ``eos_id`` so the host can strip determinately.

    Returns (tokens [B, steps], done [B] bool, cache, key).
    """
    from ..ops.sampling import sample

    def body(carry, _):
        tok, cache, key, done = carry
        logits, cache = prefill(params, tok[:, None], cache, cfg)
        key, sub = jax.random.split(key)
        nxt = sample(sub, logits[:, 0], temperature, top_p, top_k, do_sample)
        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
        done = done | (nxt == eos_id)
        return (nxt, cache, key, done), nxt

    done0 = tok == eos_id
    (tok, cache, key, done), toks = jax.lax.scan(
        body, (tok, cache, key, done0), None, length=steps)
    return toks.T, done, cache, key


_BEAM_NEG = -1.0e30   # fp32-safe "-inf" for dead beams


def beam_loop(params, tok0: jnp.ndarray, scores0: jnp.ndarray,
              cache: KVCache, cfg: LlamaConfig, *, steps: int,
              eos_id: int = 2, length_penalty: float = 1.0
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """In-graph beam search over the ring cache (one compiled program).

    The reference evaluates captions with HF generate ``num_beams=5``
    (MultiModalLLM/src/train/trainer.py:292-294); HF's loop re-orders
    host-side per token. Here the whole search is a ``lax.scan``: each
    step scores all K*V continuations in fp32, ``lax.top_k``s the next K
    beams, and gathers cache rows by beam index on device.

    Semantics (mirrored exactly by the numpy oracle in tests):
    - beams that emit ``eos_id`` freeze: score and generated length stop
      accumulating (their only continuation is eos at logp 0);
    - after ``steps`` iterations every beam (finished at its eos, alive
      at the horizon) is ranked by ``cum_logprob / len**length_penalty``
      where ``len`` counts generated tokens including the eos.

    Args:
      tok0:    [B, K] first generated token per beam (already scored).
      scores0: [B, K] fp32 cumulative logprob of that first token
               (non-viable duplicate beams should carry ~-1e30).
      cache:   KVCache with B*K rows — beam (b, k) at row b*K + k, the
               prompt prefilled into every row.

    Returns (tokens [B, K, steps+1], norm_scores [B, K], gen_len [B, K]).
    """
    B, K = tok0.shape
    T = steps + 1

    def body(carry, t):
        tok, cache, scores, finished, gen_len, hist = carry
        logits, cache = prefill(params, tok.reshape(B * K, 1), cache, cfg)
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, V)
        # finished beams continue ONLY as eos at logp 0 (score frozen)
        eos_only = jnp.full((V,), _BEAM_NEG, jnp.float32).at[eos_id].set(0.0)
        logp = jnp.where(finished[..., None], eos_only, logp)
        cand = (scores[..., None] + logp).reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(cand, K)              # [B, K]
        src = idx // V
        new_tok = (idx % V).astype(jnp.int32)

        take = lambda x: jnp.take_along_axis(x, src, axis=1)
        finished = take(finished)
        gen_len = take(gen_len)
        hist = jnp.take_along_axis(hist, src[..., None], axis=1)
        rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * K + src).reshape(-1)
        cache = KVCache(
            jnp.take(cache.kv, rows, axis=3),      # batch axis of the cache
            jnp.take(cache.valid, rows, axis=0),
            cache.index,
            None if cache.scale is None
            else jnp.take(cache.scale, rows, axis=3))

        gen_len = jnp.where(finished, gen_len, gen_len + 1)
        finished = finished | (new_tok == eos_id)
        hist = hist.at[:, :, t].set(new_tok)
        return (new_tok, cache, new_scores, finished, gen_len, hist), None

    hist0 = jnp.zeros((B, K, T), jnp.int32).at[:, :, 0].set(tok0)
    finished0 = tok0 == eos_id
    gen_len0 = jnp.ones((B, K), jnp.int32)
    (tok, cache, scores, finished, gen_len, hist), _ = jax.lax.scan(
        body,
        (tok0, cache, scores0.astype(jnp.float32), finished0, gen_len0,
         hist0),
        jnp.arange(1, T, dtype=jnp.int32))
    norm = scores / jnp.power(gen_len.astype(jnp.float32), length_penalty)
    return hist, norm, gen_len


def slot_decode_sample(params, input_ids: jnp.ndarray, active: jnp.ndarray,
                       temperature: jnp.ndarray, top_p: jnp.ndarray,
                       greedy: jnp.ndarray, cache: SlotCache,
                       keys: jax.Array, ctr: jnp.ndarray,
                       cfg: LlamaConfig, top_k: int = 0
                       ) -> Tuple[jnp.ndarray, "SlotCache"]:
    """Fused decode + per-slot sampling: one dispatch, one [B] token
    transfer per step (the round-1 batcher sampled per active slot —
    O(slots) host syncs per step). ids [B, 1] -> next tokens [B].

    ``keys`` [B, 2] uint32 is a PER-REQUEST PRNG key per slot and ``ctr``
    [B] int32 the request's sampled-token counter: row b samples with
    fold_in(keys[b], ctr[b]). A request's stream therefore depends only
    on its own (key, position) — seeded requests reproduce exactly under
    ANY concurrent mix (a single shared stream made a seed reproducible
    only under serialized arrival)."""
    from ..ops.sampling import sample_batched
    logits, cache = slot_decode(params, input_ids, active, cache, cfg)
    step_keys = jax.vmap(jax.random.fold_in)(keys, ctr)
    tok = sample_batched(step_keys, logits, temperature, top_p, greedy, top_k)
    return tok, cache


def slot_decode_sample_steps(params, tok0: jnp.ndarray, active: jnp.ndarray,
                             temperature: jnp.ndarray, top_p: jnp.ndarray,
                             greedy: jnp.ndarray, cache: SlotCache,
                             keys: jax.Array, ctr0: jnp.ndarray,
                             cfg: LlamaConfig,
                             steps: int = 8, top_k: int = 0
                             ) -> Tuple[jnp.ndarray, "SlotCache"]:
    """Multi-step scheduling: ``steps`` fused decode+sample iterations in
    ONE dispatch (lax.scan), amortizing the per-dispatch host round trip
    that dominates single-step serving through a remote PJRT link. The
    host truncates each slot's stream at eos/budget afterwards; tokens a
    slot sampled past its own finish are garbage that only land in THAT
    slot's cache rows, which the next admit's prefill re-masks (mask is
    ``col <= length`` and prefill resets length), so they are harmless by
    construction. Step t samples row b with fold_in(keys[b], ctr0[b]+t) —
    identical tokens to ``steps`` single-step calls by construction.
    tok0 [B] -> tokens [steps, B]."""

    def body(carry, t):
        tok, c = carry
        ntok, c = slot_decode_sample(params, tok[:, None], active,
                                     temperature, top_p, greedy, c,
                                     keys, ctr0 + t, cfg, top_k)
        return (ntok, c), ntok

    (_, cache), toks = jax.lax.scan(body, (tok0, cache),
                                    jnp.arange(steps, dtype=jnp.int32))
    return toks, cache


# --------------------- per-slot cache (continuous batching) -----------------

class SlotCache(NamedTuple):
    """KV cache with per-slot write positions: each batch row is an
    independent request slot that can be filled/evicted at any time —
    the substrate for continuous batching (left-aligned occupancy per
    slot; no global cursor). k/v fused like KVCache.

    Axis order [L, B, S, H_kv, 2D] — slot/batch axis LEADING, the
    opposite of KVCache's [L, S, H, B, 2D]. Measured, not assumed
    (PERF.md round 5): slot programs address the cache per-slot (prefill
    writes one slot's [N, H, 2D] slab; decode scatters one row per
    slot), so XLA's layout assignment wants batch-major physical layout
    here — compiling these programs against a [L, S, H, B, 2D] buffer
    made XLA insert a full-cache relayout copy (5G temp at slots=32:
    compile-OOM; ~10% slower serving at slots=16). The lockstep KVCache
    has the opposite preference because its programs touch ALL rows at
    one time index."""
    kv: jnp.ndarray         # [L, B, S, H_kv, 2*D]
    length: jnp.ndarray     # [B] int32 — tokens held per slot

    @property
    def k(self) -> jnp.ndarray:   # [L, B, S, H_kv, D] storage-layout view
        return self.kv[..., : self.kv.shape[-1] // 2]

    @property
    def v(self) -> jnp.ndarray:
        return self.kv[..., self.kv.shape[-1] // 2:]


def init_slot_cache(cfg: LlamaConfig, slots: int,
                    max_len: Optional[int] = None,
                    dtype=jnp.bfloat16) -> SlotCache:
    S = max_len or cfg.max_seq_len
    shape = (cfg.layers, slots, S, cfg.kv_heads, 2 * cfg.head_dim)
    return SlotCache(jnp.zeros(shape, dtype), jnp.zeros((slots,), jnp.int32))


def slot_prefill(params, input_ids: jnp.ndarray, n_tokens: jnp.ndarray,
                 slot: jnp.ndarray, cache: SlotCache,
                 cfg: LlamaConfig) -> Tuple[jnp.ndarray, SlotCache]:
    """Prefill ONE slot with a right-padded prompt [1, N] holding
    ``n_tokens`` real tokens; other slots untouched. Returns the slot's
    next-token logits [1, V] and the updated cache. ``slot``/``n_tokens``
    are traced scalars: one compiled program serves every slot.

    Only rows [0, N) of the slot are written; stale tokens beyond the new
    length are never attended (every mask is bounded by the slot length,
    and decode writes position ``length`` before reading it)."""
    N = input_ids.shape[1]
    x = L.embed(params["embed_tokens"], input_ids)
    positions = jnp.arange(N, dtype=jnp.int32)[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    mask = ((col <= row) & (col < n_tokens))[None, None]

    def step(carry, inputs):
        h, kv_all = carry
        lp, i = inputs
        q, kk, vv = _attn_qkv(lp, h, positions, cfg)
        o = mha(q, kk, vv, mask=mask)
        h = _attn_out_mlp(lp, h, o, cfg)
        # write the chunk's fused k|v [1, N, H, 2D] into slot rows [0, N)
        kv_row = jnp.concatenate([kk, vv], axis=-1)
        kv_all = jax.lax.dynamic_update_slice(
            kv_all, kv_row[None].astype(kv_all.dtype), (i, slot, 0, 0, 0))
        return (h, kv_all), None

    L_ = cache.kv.shape[0]
    (x, kv_new), _ = jax.lax.scan(
        step, (x, cache.kv),
        (params["layers"], jnp.arange(L_, dtype=jnp.int32)))
    logits = _logits(params, x, cfg)
    last = jnp.take_along_axis(logits, (n_tokens - 1)[None, None, None],
                               axis=1)[:, 0]
    new_len = cache.length.at[slot].set(n_tokens)
    return last, SlotCache(kv_new, new_len)


def slot_prefill_at(params, input_ids: jnp.ndarray, n_tokens: jnp.ndarray,
                    slot: jnp.ndarray, start: jnp.ndarray, cache: SlotCache,
                    cfg: LlamaConfig,
                    prefix_kv: Optional[jnp.ndarray] = None
                    ) -> Tuple[jnp.ndarray, SlotCache]:
    """Prefill a chunk into ONE slot at position ``start``, attending
    over the slot's already-cached [0, start) prefix — the prefix-cache
    admit path (vLLM-style shared-system-prompt reuse; the reference has
    no equivalent). RoPE positions continue at ``start``. Returns the
    slot's next-token logits [1, V] and the updated cache.

    Differs from :func:`slot_prefill` (the start=0 fast path, which never
    reads the cache): each layer reads the slot row, writes the chunk at
    [start, start+N), and attends over the full row with the combined
    prefix+causal mask ``col <= start + row  AND  col < start + n``.

    ``prefix_kv`` [L, P, H_kv, 2D], if given, is a pinned shared-prefix
    KV installed into rows [0, P) PER LAYER inside the scan, right after
    the layer's slot row is sliced out — an ~P*H*2D-sized VMEM-resident
    update. Installing it with one whole-cache dynamic_update_slice
    BEFORE the scan instead made XLA materialize the donated cache as a
    full HLO-temp copy (6.5 GiB at slots=16 max_len=832: compile-OOM,
    19.75G > 15.75G hbm)."""
    N = input_ids.shape[1]
    S = cache.kv.shape[2]
    hd = cfg.head_dim
    x = L.embed(params["embed_tokens"], input_ids)
    positions = start + jnp.arange(N, dtype=jnp.int32)[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (N, S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, S), 0)
    mask = ((col <= start + row) & (col < start + n_tokens))[None, None]

    def step(carry, inputs):
        h, kv_all = carry
        lp, i = inputs[0], inputs[1]
        q, kk, vv = _attn_qkv(lp, h, positions, cfg)
        ckv = jax.lax.dynamic_slice(
            kv_all, (i, slot, 0, 0, 0),
            (1, 1, S, cfg.kv_heads, 2 * hd))[0]           # [1, S, H, 2D]
        if prefix_kv is not None:
            ckv = jax.lax.dynamic_update_slice(
                ckv, inputs[2][None].astype(ckv.dtype), (0, 0, 0, 0))
        kv_chunk = jnp.concatenate([kk, vv], axis=-1).astype(ckv.dtype)
        ckv = jax.lax.dynamic_update_slice(ckv, kv_chunk, (0, start, 0, 0))
        o = mha(q, ckv[..., :hd].astype(q.dtype),
                ckv[..., hd:].astype(q.dtype), mask=mask)
        h = _attn_out_mlp(lp, h, o, cfg)
        kv_all = jax.lax.dynamic_update_slice(kv_all, ckv[None],
                                              (i, slot, 0, 0, 0))
        return (h, kv_all), None

    L_ = cache.kv.shape[0]
    xs = (params["layers"], jnp.arange(L_, dtype=jnp.int32))
    if prefix_kv is not None:
        xs = xs + (prefix_kv,)
    (x, kv_new), _ = jax.lax.scan(step, (x, cache.kv), xs)
    logits = _logits(params, x, cfg)
    last = jnp.take_along_axis(logits, (n_tokens - 1)[None, None, None],
                               axis=1)[:, 0]
    new_len = cache.length.at[slot].set(start + n_tokens)
    return last, SlotCache(kv_new, new_len)


def install_prefix(prefix_kv: jnp.ndarray, slot: jnp.ndarray,
                   cache: SlotCache) -> SlotCache:
    """Copy a precomputed prefix's fused kv [L, P, H_kv, 2D] into one
    slot's rows [0, P); the slot length is set by the follow-up
    :func:`slot_prefill_at`."""
    kv = jax.lax.dynamic_update_slice(
        cache.kv, prefix_kv[:, None].astype(cache.kv.dtype),
        (0, slot, 0, 0, 0))
    return SlotCache(kv, cache.length)


def install_and_prefill_at(params, prefix_kv: jnp.ndarray,
                           input_ids: jnp.ndarray, n_tokens: jnp.ndarray,
                           slot: jnp.ndarray, start: jnp.ndarray,
                           cache: SlotCache, cfg: LlamaConfig
                           ) -> Tuple[jnp.ndarray, SlotCache]:
    """Prefix install FOLDED into the remainder's prefill: ONE dispatch.

    A separate :func:`install_prefix` dispatch costs a full host round
    trip (~36 ms through a remote PJRT link) — measured to outweigh the
    prefill compute a short shared prefix saves (PERF.md round 4). Fusing
    the block copy into the first prefill program makes a prefix hit
    strictly cheaper than recomputing it, at every prefix length. The
    install rides the per-layer scan (see :func:`slot_prefill_at`), NOT a
    whole-cache update before it — the latter broke cache donation and
    compile-OOMed at the 512-token-prefix geometry."""
    return slot_prefill_at(params, input_ids, n_tokens, slot, start, cache,
                           cfg, prefix_kv=prefix_kv)


def slot_decode(params, input_ids: jnp.ndarray, active: jnp.ndarray,
                cache: SlotCache, cfg: LlamaConfig
                ) -> Tuple[jnp.ndarray, SlotCache]:
    """One decode step for ALL slots; ``active`` [B] bool gates cache
    writes and length increments for occupied slots. ids [B, 1]."""
    B = input_ids.shape[0]
    S = cache.kv.shape[2]
    hd = cfg.head_dim
    x = L.embed(params["embed_tokens"], input_ids)
    positions = cache.length[:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[None, None]
    mask = col <= cache.length[:, None, None, None]   # [B,1,1,S]

    rows = jnp.arange(B)
    pos = cache.length.clip(0, S - 1)

    def step(carry, inputs):
        h, kv_all = carry
        lp, i = inputs
        q, kk, vv = _attn_qkv(lp, h, positions, cfg)
        # scatter each row's fused k|v at its own write position; positions
        # are PER-ROW, so an inactive row's clipped cursor only touches
        # that row — preserve it by rewriting the old value.
        ckv = kv_all[i]                                   # [B, S, H, 2D]
        kv_cur = jnp.concatenate([kk, vv], axis=-1)[:, 0].astype(ckv.dtype)
        old = ckv[rows, pos]                              # [B, H, 2D]
        ckv = ckv.at[rows, pos].set(
            jnp.where(active[:, None, None], kv_cur, old))
        o = mha(q, ckv[..., :hd].astype(q.dtype),
                ckv[..., hd:].astype(q.dtype), mask=mask)
        h = _attn_out_mlp(lp, h, o, cfg)
        kv_all = jax.lax.dynamic_update_index_in_dim(kv_all, ckv, i, 0)
        return (h, kv_all), None

    L_ = cache.kv.shape[0]
    (x, kv_new), _ = jax.lax.scan(
        step, (x, cache.kv),
        (params["layers"], jnp.arange(L_, dtype=jnp.int32)))
    logits = _logits(params, x, cfg)[:, 0]
    new_len = jnp.where(active, cache.length + 1, cache.length)
    return logits, SlotCache(kv_new, new_len)
