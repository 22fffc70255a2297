"""Autoregressive generation engine with preallocated KV cache.

Replaces the reference's HF ``model.generate`` sampling loop
(scripts/seed_llama_inference_8B.py:28-37) with a TPU-native engine:

- single jitted prefill over the (padded) prompt, single jitted decode step
  reused for every token — two compiled programs total, no shape churn;
- the KV cache lives on device across the whole request;
- slot-based batching: multiple sequences decode in lockstep, finished
  sequences are masked (the serving layer refills slots — continuous
  batching in the scheduler, static shapes in XLA).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as M
from ..ops.sampling import sample


@dataclass
class GenerationConfig:
    # reference defaults: scripts/seed_llama_inference_8B.py:81-87
    max_new_tokens: int = 512
    temperature: float = 1.0
    top_p: float = 0.5
    top_k: int = 0
    do_sample: bool = True
    eos_token_id: int = 2
    forced_first_token: Optional[int] = None   # force_boi (flask :158-175)
    # beam search (the caption eval generates with num_beams=5,
    # MultiModalLLM/src/train/trainer.py:292-294); >1 implies deterministic
    # decoding — do_sample/temperature/top_p are ignored
    num_beams: int = 1
    length_penalty: float = 1.0


def _pad_to(x: np.ndarray, n: int, value: int = 0) -> np.ndarray:
    if x.shape[-1] >= n:
        return x[..., :n]
    pad = np.full((*x.shape[:-1], n - x.shape[-1]), value, x.dtype)
    return np.concatenate([x, pad], axis=-1)


class LlamaEngine:
    """Holds params + compiled prefill/decode programs for one model.

    Decode runs ``chunk_steps`` tokens per dispatch via ``M.decode_loop``
    (sampling in-graph, lax.scan over steps): one host round trip and one
    [B, chunk] token transfer per chunk instead of per token.
    """

    def __init__(self, params, cfg: M.LlamaConfig, max_len: Optional[int] = None,
                 prompt_buckets: Sequence[int] = (32, 64, 128, 256, 512, 1024),
                 cache_dtype=jnp.bfloat16, chunk_steps: int = 32):
        self.params = params
        self.cfg = cfg
        self.max_len = max_len or cfg.max_seq_len
        self.buckets = sorted(b for b in prompt_buckets if b <= self.max_len)
        self.cache_dtype = cache_dtype
        self.chunk_steps = chunk_steps

        # donate the cache: in-place KV update buffers — without donation
        # XLA keeps input+output cache copies alive (2x cache HBM)
        self._prefill = jax.jit(
            functools.partial(M.prefill, cfg=cfg), donate_argnums=(2,))
        self._decode = jax.jit(
            functools.partial(M.decode_step, cfg=cfg), donate_argnums=(2,))
        self._loops = {}   # (steps, temp, top_p, top_k, do_sample, eos) -> fn

        def sample_fn(key, logits, temperature, top_p, top_k, do_sample):
            return sample(key, logits, temperature, top_p, top_k, do_sample)

        # sampling hyperparams are static: they select the compiled program
        # (a handful of configs in practice), keeping the sample body branch-free
        self._sample = jax.jit(sample_fn, static_argnums=(2, 3, 4, 5))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_len

    def _loop(self, steps: int, gen: GenerationConfig):
        key = (steps, gen.temperature, gen.top_p, gen.top_k, gen.do_sample,
               gen.eos_token_id)
        fn = self._loops.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                M.decode_loop, cfg=self.cfg, steps=steps,
                temperature=gen.temperature, top_p=gen.top_p,
                top_k=gen.top_k, do_sample=gen.do_sample,
                eos_id=gen.eos_token_id), donate_argnums=(2,))
            self._loops[key] = fn
        return fn

    def generate(
        self,
        prompt_ids: Sequence[Sequence[int]],
        gen: GenerationConfig = GenerationConfig(),
        seed: int = 0,
    ) -> List[List[int]]:
        """Batch generate. Returns new tokens per sequence (without prompt)."""
        if gen.num_beams > 1:
            return self._beam_generate(prompt_ids, gen)
        B = len(prompt_ids)
        lens = [len(p) for p in prompt_ids]
        bucket = self._bucket(max(lens))
        # Left-pad so every row's last prompt token sits at the same column;
        # RoPE positions and attention masking are derived in-graph from the
        # chunk mask (models/llama.py prefill).
        ids = np.zeros((B, bucket), np.int32)
        mask = np.zeros((B, bucket), np.int32)
        for i, p in enumerate(prompt_ids):
            ids[i, bucket - lens[i]:] = np.asarray(p, np.int32)
            mask[i, bucket - lens[i]:] = 1

        cache = M.init_cache(self.cfg, B, self.max_len, self.cache_dtype)
        logits, cache = self._prefill(self.params, jnp.asarray(ids), cache,
                                      chunk_mask=jnp.asarray(mask))
        next_logits = logits[:, -1]

        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        # first token: host-side (forced_first_token / force_boi lives here)
        if gen.forced_first_token is not None:
            tok = jnp.full((B,), gen.forced_first_token, jnp.int32)
        else:
            tok = self._sample(sub, next_logits, gen.temperature,
                               gen.top_p, gen.top_k, gen.do_sample)
        tok_np = np.asarray(tok)
        out_tokens: List[List[int]] = [[int(t)] for t in tok_np]
        finished = tok_np == gen.eos_token_id

        # remaining tokens: chunks of `chunk_steps` per dispatch, sampling
        # + eos masking in-graph; the host only unpacks [B, chunk] blocks
        budget = gen.max_new_tokens - 1
        index = bucket   # host-tracked write cursor (avoids device syncs)
        while budget > 0 and not finished.all():
            steps = min(self.chunk_steps, budget)
            if index + steps >= self.max_len:
                break   # cache full
            loop = self._loop(steps, gen)
            toks, done, cache, key = loop(self.params, tok, cache, key)
            toks_np = np.asarray(toks)                      # [B, steps]
            for i in range(B):
                if finished[i]:
                    continue
                row = toks_np[i]
                hits = np.nonzero(row == gen.eos_token_id)[0]
                end = int(hits[0]) + 1 if hits.size else steps
                out_tokens[i].extend(int(t) for t in row[:end])
                if hits.size:
                    finished[i] = True
            tok = toks[:, -1]
            finished |= np.asarray(done)
            budget -= steps
            index += steps
        # strip trailing eos
        for i in range(B):
            if out_tokens[i] and out_tokens[i][-1] == gen.eos_token_id:
                out_tokens[i] = out_tokens[i][:-1]
        return out_tokens

    def _beam_generate(self, prompt_ids: Sequence[Sequence[int]],
                       gen: GenerationConfig) -> List[List[int]]:
        """num_beams>1 path: one prefill, K-fold cache expansion, then the
        whole search as ONE compiled scan (M.beam_loop). Returns the best
        beam's new tokens per sequence (eos stripped)."""
        B, K = len(prompt_ids), gen.num_beams
        lens = [len(p) for p in prompt_ids]
        bucket = self._bucket(max(lens))
        ids = np.zeros((B, bucket), np.int32)
        mask = np.zeros((B, bucket), np.int32)
        for i, p in enumerate(prompt_ids):
            ids[i, bucket - lens[i]:] = np.asarray(p, np.int32)
            mask[i, bucket - lens[i]:] = 1

        cache = M.init_cache(self.cfg, B, self.max_len, self.cache_dtype)
        logits, cache = self._prefill(self.params, jnp.asarray(ids), cache,
                                      chunk_mask=jnp.asarray(mask))
        logp0 = jax.nn.log_softmax(
            logits[:, -1].astype(jnp.float32), axis=-1)
        if gen.forced_first_token is not None:
            # all beams share the forced token: only beam 0 is viable at
            # init, or top_k would clone identical beams K times
            tok0 = jnp.full((B, K), gen.forced_first_token, jnp.int32)
            scores0 = jnp.full((B, K), M._BEAM_NEG, jnp.float32).at[:, 0].set(
                logp0[jnp.arange(B), gen.forced_first_token])
        else:
            scores0, tok0 = jax.lax.top_k(logp0, K)
            tok0 = tok0.astype(jnp.int32)

        cache = M.KVCache(
            jnp.repeat(cache.kv, K, axis=3),       # batch axis of the cache
            jnp.repeat(cache.valid, K, axis=0),
            cache.index,
            None if cache.scale is None
            else jnp.repeat(cache.scale, K, axis=3))

        steps = max(0, min(gen.max_new_tokens - 1,
                           self.max_len - bucket - 1))
        key = (steps, K, gen.eos_token_id, gen.length_penalty, "beam")
        fn = self._loops.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                M.beam_loop, cfg=self.cfg, steps=steps,
                eos_id=gen.eos_token_id,
                length_penalty=gen.length_penalty), donate_argnums=(3,))
            self._loops[key] = fn
        hist, norm, gen_len = fn(self.params, tok0, scores0, cache)
        hist, norm, gen_len = (np.asarray(hist), np.asarray(norm),
                               np.asarray(gen_len))
        out: List[List[int]] = []
        for b in range(B):
            k = int(norm[b].argmax())
            toks = [int(t) for t in hist[b, k, :int(gen_len[b, k])]]
            if toks and toks[-1] == gen.eos_token_id:
                toks = toks[:-1]
            out.append(toks)
        return out
