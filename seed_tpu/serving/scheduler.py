"""Continuous batching scheduler.

The throughput serving mode (BASELINE.json config #4): a fixed pool of
decode slots runs in lockstep; finished requests free their slot
immediately and queued requests are prefilled into free slots between
decode steps — no waiting for the whole batch to drain (the reference's
HF generate serves one request at a time, seed_llama_flask.py:172).

Static XLA shapes throughout: two compiled programs total —
``slot_prefill`` (one program per prompt bucket) and ``slot_decode``
(one program). Slot state lives on device in the SlotCache; the
scheduler only moves token ids.
"""
from __future__ import annotations

import collections
import functools
import itertools
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as M
from ..ops.sampling import sample
from .engine import GenerationConfig

_ZERO_KEY = np.zeros(2, np.uint32)


@dataclass
class Request:
    request_id: int
    prompt: List[int]
    gen: GenerationConfig
    # per-request PRNG key: token t samples with fold_in(key, t), so the
    # stream depends only on this request — reproducible under any
    # concurrent slot mix (a shared stream was reproducible only under
    # serialized arrival)
    key: np.ndarray = field(default_factory=lambda: _ZERO_KEY.copy())
    tokens: List[int] = field(default_factory=list)
    done: bool = False
    # wall-clock accounting (perf_counter): TTFT = t_first - t_submit,
    # end-to-end latency = t_done - t_submit
    t_submit: float = 0.0
    t_first: float = 0.0
    t_done: float = 0.0


class ContinuousBatcher:
    def __init__(self, params, cfg: M.LlamaConfig, slots: int = 8,
                 max_len: Optional[int] = None,
                 prompt_buckets: Sequence[int] = (32, 64, 128, 256, 512),
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 decode_chunk: int = 1):
        self.params = params
        self.cfg = cfg
        self.slots = slots
        # >1 = multi-step scheduling: scan this many decode+sample steps
        # per dispatch (M.slot_decode_sample_steps) and truncate host-side;
        # amortizes the per-dispatch round trip of a remote PJRT link at
        # the cost of admits happening only between chunks.
        self.decode_chunk = decode_chunk
        self.max_len = max_len or cfg.max_seq_len
        self.buckets = sorted(b for b in prompt_buckets if b < self.max_len)
        self.cache = M.init_slot_cache(cfg, slots, self.max_len, cache_dtype)
        self._prefill = jax.jit(functools.partial(M.slot_prefill, cfg=cfg),
                                donate_argnums=(4,))
        self._prefill_at = jax.jit(
            functools.partial(M.slot_prefill_at, cfg=cfg),
            donate_argnums=(5,))
        # prefix install FUSED into the first prefill chunk's dispatch —
        # a separate install dispatch cost more than a short prefix saved
        # (PERF.md round 4); one compiled program per (prefix_len, bucket)
        self._install_prefill = jax.jit(
            functools.partial(M.install_and_prefill_at, cfg=cfg),
            donate_argnums=(6,))
        # prefix cache: token-tuple -> fused kv [L, P, H_kv, 2D] on device
        # (vLLM-style shared-system-prompt reuse; longest match wins)
        self.prefixes: Dict[tuple, jnp.ndarray] = {}
        self._decode = jax.jit(functools.partial(M.slot_decode, cfg=cfg),
                               donate_argnums=(3,))
        # fused decode + per-slot sampling: one dispatch and ONE [slots]
        # token transfer per step (round 1 synced per active slot). top_k
        # is a static shape -> one compiled program per distinct top_k.
        self._decode_sample = jax.jit(
            functools.partial(M.slot_decode_sample, cfg=cfg),
            donate_argnums=(6,), static_argnames=("top_k",))
        self._decode_sample_steps = jax.jit(
            functools.partial(M.slot_decode_sample_steps, cfg=cfg),
            donate_argnums=(6,), static_argnames=("top_k", "steps"))
        # first-token pick after prefill: same per-request fold_in(key, ctr)
        # stream as the batched decode programs
        self._sample = jax.jit(
            lambda key, ctr, logits, t, p, k, s:
                sample(jax.random.fold_in(key, ctr), logits, t, p, k, s),
            static_argnums=(3, 4, 5, 6))
        self._seed = np.uint32(seed)
        self.queue: collections.deque = collections.deque()
        self.active: List[Optional[Request]] = [None] * slots
        # which registered prefix a slot's cache positions [0, len) hold.
        # Decode and start>0 prefills never touch [0, len), so a slot
        # re-admitted with the SAME prefix skips the install dispatch —
        # through a remote PJRT link one dispatch (~36 ms) outweighs the
        # whole prefill of a short system prompt (PERF.md round 4).
        self.slot_prefix: List[Optional[tuple]] = [None] * slots
        self.next_tok = np.zeros(slots, np.int32)
        self._id_counter = itertools.count()
        self.finished: Dict[int, Request] = {}

    # ------------------------------ API ------------------------------------

    def submit(self, prompt: Sequence[int],
               gen: Optional[GenerationConfig] = None,
               key: Optional[np.ndarray] = None) -> int:
        """``key`` (uint32[2]) seeds this request's private sampling
        stream; default derives one from (batcher seed, request id)."""
        if len(prompt) >= self.max_len:
            raise ValueError(
                f"prompt of {len(prompt)} tokens exceeds max_len="
                f"{self.max_len} (no room to generate)")
        gen = gen or GenerationConfig()
        rid = next(self._id_counter)
        if key is None:
            key = np.array([self._seed, rid], np.uint32)
        req = Request(rid, list(prompt), gen, key=np.asarray(key, np.uint32))
        req.t_submit = time.perf_counter()
        self.queue.append(req)
        return rid

    def register_prefix(self, prefix: Sequence[int]) -> None:
        """Precompute + pin the KV for a shared prompt prefix (system
        prompt). Future submits whose prompt starts with it skip its
        prefill work: the KV is block-copied into the slot and only the
        remainder runs through the model. Prefixes longer than the
        largest prompt bucket are prefilled in multiple chunks."""
        prefix = tuple(prefix)
        if prefix in self.prefixes or not prefix:
            return
        n = len(prefix)
        if n >= self.max_len:
            raise ValueError(
                f"prefix of {n} tokens exceeds max_len={self.max_len}")
        scratch = M.init_slot_cache(self.cfg, 1, self.max_len,
                                    self.cache.kv.dtype)
        _, scratch, _ = self._chunked_prefill(list(prefix), 0, 0, scratch)
        # pin [L, P, H_kv, 2D]; jnp slicing keeps it on device
        self.prefixes[prefix] = scratch.kv[:, 0, :n]

    def _match_prefix(self, prompt: List[int]):
        """Longest registered prefix that is a strict prefix of prompt."""
        best = None
        for pref in self.prefixes:
            p = len(pref)
            if (p < len(prompt) and (best is None or p > best)
                    and tuple(prompt[:p]) == pref):
                best = p
        return (best, self.prefixes[tuple(prompt[:best])]) \
            if best is not None else None

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.active)

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drain all submitted requests; returns {request_id: tokens}."""
        for _ in range(max_steps):
            if not self.has_work():
                break
            self.step()
        return {rid: r.tokens for rid, r in self.finished.items()}

    # ----------------------------- internals --------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunked_prefill(self, tokens: List[int], slot: int, start: int,
                         cache, install_kv=None):
        """Prefill ``tokens[start:]`` into ``slot`` in bucket-sized chunks
        (positions [0, start) must already hold cached KV — the prefix-hit
        path). Prompts longer than the largest bucket take multiple
        dispatches; a chunk whose bucket would overrun the cache end
        SLIDES BACK so it ends exactly at max_len, re-listing (and
        recomputing) the overlapping already-cached tokens instead of
        letting dynamic_update_slice clamp the write offset and corrupt
        the prefix tail.

        Returns (last-token logits [1, V], cache, clobbered_prefix): the
        flag is True when a slide-back rewrote positions below ``start``
        — the recomputed values are equivalent but not guaranteed
        bit-identical to an installed prefix's pinned KV (different chunk
        boundaries under a lossy cache dtype), so the caller must drop
        the slot's prefix-identity tag and re-install on the next hit."""
        S = self.max_len
        n_total = len(tokens)
        pos = start
        logits = None
        clobbered = False
        while pos < n_total:
            n = min(n_total - pos, self.buckets[-1])
            bucket = self._bucket(n)
            chunk_start = pos
            if chunk_start + bucket > S:
                chunk_start = S - bucket      # slide back; overlap recomputed
            clobbered = clobbered or chunk_start < start
            n_eff = pos + n - chunk_start     # real tokens incl. overlap
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :n_eff] = tokens[chunk_start:pos + n]
            if chunk_start == 0:
                logits, cache = self._prefill(
                    self.params, jnp.asarray(ids),
                    jnp.asarray(n_eff, jnp.int32),
                    jnp.asarray(slot, jnp.int32), cache)
            elif install_kv is not None:
                # prefix-hit admit: block-copy the pinned prefix KV and
                # run this chunk in the SAME dispatch
                logits, cache = self._install_prefill(
                    self.params, install_kv, jnp.asarray(ids),
                    jnp.asarray(n_eff, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(chunk_start, jnp.int32), cache)
                install_kv = None
            else:
                logits, cache = self._prefill_at(
                    self.params, jnp.asarray(ids),
                    jnp.asarray(n_eff, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(chunk_start, jnp.int32), cache)
            pos += n
        return logits, cache, clobbered

    def _admit(self):
        """Prefill queued requests into free slots."""
        for slot in range(self.slots):
            if self.active[slot] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            hit = self._match_prefix(req.prompt)
            install_kv = None
            if hit is not None:
                start, pkv = hit
                pref = tuple(req.prompt[:start])
                if self.slot_prefix[slot] != pref:
                    install_kv = pkv   # folded into the first prefill chunk
                    self.slot_prefix[slot] = pref
            else:
                start = 0
                # a from-0 prefill overwrites [0, plen): the slot no
                # longer holds any registered prefix
                self.slot_prefix[slot] = None
            logits, self.cache, clobbered = self._chunked_prefill(
                req.prompt, slot, start, self.cache, install_kv)
            if clobbered:
                # a slide-back chunk rewrote positions inside the prefix
                # region: the rows are no longer the pinned install
                self.slot_prefix[slot] = None
            tok = self._pick(logits, req, first=True)
            self.active[slot] = req
            self.next_tok[slot] = tok
            req.tokens.append(int(tok))
            req.t_first = time.perf_counter()
            self._maybe_finish(slot)

    def _pick(self, logits, req: Request, first: bool = False) -> int:
        g = req.gen
        if first and g.forced_first_token is not None:
            return g.forced_first_token
        tok = self._sample(jnp.asarray(req.key),
                           jnp.asarray(len(req.tokens), jnp.int32), logits,
                           g.temperature, g.top_p, g.top_k, g.do_sample)
        return int(np.asarray(tok)[0])

    def _maybe_finish(self, slot: int):
        req = self.active[slot]
        if req is None:
            return
        hit_eos = req.tokens and req.tokens[-1] == req.gen.eos_token_id
        full = (len(req.tokens) >= req.gen.max_new_tokens
                or len(req.prompt) + len(req.tokens) >= self.max_len - 1)
        if hit_eos or full:
            if hit_eos:
                req.tokens.pop()
            req.done = True
            req.t_done = time.perf_counter()
            self.finished[req.request_id] = req
            self.active[slot] = None   # slot freed for the next admit

    def _chunk_budget(self) -> int:
        """Steps the whole pool can decode in ONE dispatch without any
        active slot overrunning the cache end — the only HARD bound.

        Token budgets and eos do NOT cap the chunk: a slot finishing
        mid-chunk has its tail discarded host-side (harmless by
        construction, slot_decode_sample_steps docstring), and admits
        can only happen between chunks anyway, so over-decoding a
        finished slot costs nothing the freed slot could have used.
        Round 4 capped by the POOL-MIN remaining budget, which collapses
        k_eff to 1-2 whenever any one slot is nearly done — at slots=32
        that is almost every chunk, and it was the real cause of the
        "slots=32 regresses 2x" measurement (PERF.md round 5), not the
        decode program."""
        rem = [(self.max_len - 1) - (len(r.prompt) + len(r.tokens))
               for r in self.active if r is not None]
        return max(1, min(rem)) if rem else 1

    def step(self):
        self._admit()
        active_mask = np.asarray([r is not None for r in self.active])
        if not active_mask.any():
            return
        ids = self.next_tok.copy().reshape(self.slots, 1)
        # per-slot sampling params ride the batch; a single distinct top_k
        # is required per compiled program — mixed top_k falls back to the
        # slot-wise host path (rare; the reference never sets top_k at all)
        gens = [r.gen if r is not None else GenerationConfig()
                for r in self.active]
        # per-slot request keys + sampled-token counters: token t of a
        # request samples with fold_in(req.key, t) on device
        keys = np.stack([r.key if r is not None else _ZERO_KEY
                         for r in self.active])
        ctrs = np.asarray([len(r.tokens) if r is not None else 0
                           for r in self.active], np.int32)
        top_ks = {g.top_k for g, a in zip(gens, active_mask) if a}
        k_eff = min(self.decode_chunk, self._chunk_budget())
        # floor to a power of two: ``steps`` is a static shape, so every
        # distinct value compiles its own program — pow2 bounds the count
        # at log2(chunk) programs instead of one per budget remainder
        k_eff = 1 << (k_eff.bit_length() - 1)
        if len(top_ks) <= 1 and k_eff > 1:
            temps = np.asarray([g.temperature for g in gens], np.float32)
            tops = np.asarray([g.top_p for g in gens], np.float32)
            greedy = np.asarray(
                [(not g.do_sample) or g.temperature == 0.0 for g in gens])
            toks_dev, self.cache = self._decode_sample_steps(
                self.params, jnp.asarray(self.next_tok),
                jnp.asarray(active_mask), jnp.asarray(temps),
                jnp.asarray(tops), jnp.asarray(greedy), self.cache,
                jnp.asarray(keys), jnp.asarray(ctrs),
                steps=k_eff, top_k=(top_ks.pop() if top_ks else 0))
            toks = np.asarray(toks_dev)         # [k_eff, slots], ONE transfer
            live = [self.active[s] is not None for s in range(self.slots)]
            for t in range(k_eff):
                for slot in range(self.slots):
                    if not live[slot]:
                        continue            # finished mid-chunk: discard tail
                    req = self.active[slot]
                    tok = int(toks[t, slot])
                    req.tokens.append(tok)
                    self.next_tok[slot] = tok
                    self._maybe_finish(slot)   # clears the slot when done
                    live[slot] = self.active[slot] is not None
            return
        if len(top_ks) > 1:
            logits, self.cache = self._decode(
                self.params, jnp.asarray(ids), jnp.asarray(active_mask),
                self.cache)
            toks = np.asarray([
                self._pick(logits[s:s + 1], self.active[s])
                if self.active[s] is not None else 0
                for s in range(self.slots)], np.int32)
        else:
            temps = np.asarray([g.temperature for g in gens], np.float32)
            tops = np.asarray([g.top_p for g in gens], np.float32)
            greedy = np.asarray(
                [(not g.do_sample) or g.temperature == 0.0 for g in gens])
            tok_dev, self.cache = self._decode_sample(
                self.params, jnp.asarray(ids), jnp.asarray(active_mask),
                jnp.asarray(temps), jnp.asarray(tops), jnp.asarray(greedy),
                self.cache, jnp.asarray(keys), jnp.asarray(ctrs),
                top_k=(top_ks.pop() if top_ks else 0))
            toks = np.asarray(tok_dev)          # ONE transfer for all slots
        for slot in range(self.slots):
            req = self.active[slot]
            if req is None:
                continue
            tok = int(toks[slot])
            req.tokens.append(tok)
            self.next_tok[slot] = tok
            self._maybe_finish(slot)


class ScheduledEngine:
    """Engine-compatible facade over :class:`ContinuousBatcher` + a drain
    thread: concurrent callers (e.g. Flask request handlers — the server
    runs threaded) submit into one shared slot pool and their requests
    batch onto the SAME decode dispatches, instead of each request
    serializing a private engine call (the reference serves one request
    at a time, gradio_demo/seed_llama_flask.py:172).

    Exposes exactly the surface the serving stack uses
    (``generate(prompts, gen, seed) -> List[List[int]]``,
    multimodal.py:214 / server.py:143), so ``SeedLlamaInterface`` — and
    with it the offloaded tokenizer/diffusion path — composes unchanged.

    Thread contract: the batcher is single-threaded; all mutation happens
    under one lock. ``step()`` (device dispatch + one host transfer) runs
    holding it, submitters/waiters take it only briefly.
    """

    def __init__(self, params, cfg: M.LlamaConfig, slots: int = 8,
                 max_len: Optional[int] = None,
                 prompt_buckets: Sequence[int] = (32, 64, 128, 256, 512),
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 decode_chunk: int = 8):
        self.batcher = ContinuousBatcher(
            params, cfg, slots=slots, max_len=max_len,
            prompt_buckets=prompt_buckets, cache_dtype=cache_dtype,
            seed=seed, decode_chunk=decode_chunk)
        self._cv = threading.Condition()
        self._closed = False
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def register_prefix(self, prefix: Sequence[int]) -> None:
        with self._cv:
            self.batcher.register_prefix(prefix)

    def generate(self, prompts: Sequence[Sequence[int]],
                 gen: Optional[GenerationConfig] = None,
                 seed: Optional[int] = None) -> List[List[int]]:
        """Blocks until all ``prompts`` finish; safe from many threads.

        ``seed`` seeds PER-REQUEST sampling keys (prompt i gets
        fold-target (seed, i)) — reproducible regardless of what other
        requests are in flight, because each request samples from its own
        key stream (slot_decode_sample docstring)."""
        with self._cv:
            rids = [self.batcher.submit(
                list(p), gen,
                key=None if seed is None else
                np.array([np.uint32(seed), np.uint32(0x80000000 + i)],
                         np.uint32))
                for i, p in enumerate(prompts)]
            self._cv.notify_all()
            self._cv.wait_for(
                lambda: self._error is not None
                or all(r in self.batcher.finished for r in rids))
            if self._error is not None:
                raise RuntimeError(
                    "serving drain thread died") from self._error
            # pop: a long-running server must not retain every finished
            # request (prompt + tokens) forever
            return [self.batcher.finished.pop(r).tokens for r in rids]

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join()

    def _drain(self):
        while True:
            with self._cv:
                self._cv.wait_for(
                    lambda: self._closed or self.batcher.has_work())
                if self._closed:
                    return
                try:
                    self.batcher.step()
                except BaseException as e:   # wake waiters, don't hang them
                    self._error = e
                    self._cv.notify_all()
                    return
                self._cv.notify_all()
