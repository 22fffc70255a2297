#!/usr/bin/env python
"""Probe: decode attention formulations over the [L,S,H,B,2D] cache.

Round-3 layout change made the logical cache order match XLA's round-2
preferred physical order — but the first einsum formulation regressed
decode 13x (bench r3a: 78.8 tok/s vs r2's 874). Hypothesis: einsum
lowers to dot_general with leading batch dims, so XLA physically
transposes the (dequantized) cache to [B,H,S,D] EVERY step, per layer —
exactly the copies the layout change was meant to remove.

Variants (all numerically = fp32 softmax mha):
  einsum   — the regressed formulation (dot_general, batch dims b,h)
  moveaxis — explicit logical transpose back to [B,S,H,D] + old mha path
  stream   — N=1, G=1 only: broadcast-multiply + reduce over the minor
             axis, softmax over the MAJOR (s) axis; never transposes the
             cache — pure VPU streaming at cache-read roofline.

Times M.decode_loop (steps=16) at full 8B scale per variant; also dumps
compiled temp memory. Usage: python scripts/probe_cached_attn.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from seed_tpu.models import llama as M
from seed_tpu.models.llama import _cache_kv_dequant
from seed_tpu.ops.attention import NEG_INF, mha


def attn_einsum(q, ckv, cscale, mask, cfg):
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


def attn_moveaxis(q, ckv, cscale, mask, cfg):
    B, N, H, D = q.shape
    k, v = _cache_kv_dequant(ckv, cscale, q.dtype)     # [S, H_kv, B, D]
    k = jnp.moveaxis(k, 2, 0)                          # [B, S, H_kv, D]
    v = jnp.moveaxis(v, 2, 0)
    return mha(q, k, v, mask=mask).reshape(B, N, H * D)


def attn_stream(q, ckv, cscale, mask, cfg):
    B, N, H, D = q.shape
    Hkv = ckv.shape[1]
    if N != 1 or H != Hkv:
        return attn_moveaxis(q, ckv, cscale, mask, cfg)
    k, v = _cache_kv_dequant(ckv, cscale, q.dtype)     # [S, H, B, D]
    qT = q[:, 0].transpose(1, 0, 2)                    # [H, B, D] (tiny)
    s = jnp.sum(k.astype(jnp.float32) * qT[None].astype(jnp.float32),
                axis=-1) * (D ** -0.5)                 # [S, H, B] f32
    if mask is not None:
        mT = mask[:, 0, 0, :].T                        # [S, B]
        s = jnp.where(mT[:, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=0).astype(q.dtype)      # over MAJOR s
    o = jnp.sum(p[..., None] * v, axis=0)              # [H, B, D]
    return o.transpose(1, 0, 2).reshape(B, 1, H * D)


def run(params, cfg, B, S, variant_fn, steps=16, prompt_len=32):
    M._cached_attn_orig = getattr(M, "_cached_attn_orig", M._cached_attn)
    M._cached_attn = variant_fn
    try:
        loop = jax.jit(functools.partial(
            M.decode_loop, cfg=cfg, steps=steps, temperature=1.0, top_p=0.5,
            eos_id=-1), donate_argnums=(2,))
        cache = M.init_cache(cfg, B, S)
        cache = cache._replace(
            valid=cache.valid.at[:, :prompt_len].set(True),
            index=jnp.asarray(prompt_len, jnp.int32))
        tok = jnp.ones((B,), jnp.int32)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        compile_s = time.perf_counter() - t0
        tok = toks[:, -1]
        t0 = time.perf_counter()
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        dt = time.perf_counter() - t0
        return B * steps / dt, dt / steps * 1e3, compile_s
    finally:
        M._cached_attn = M._cached_attn_orig


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_decode_int8cache import build_params
    cfg = M.SEED_LLAMA_8B
    print(f"device: {jax.devices()[0]}", flush=True)
    params = build_params(cfg)
    B, S = 32, 192
    for name, fn in [("stream", attn_stream), ("moveaxis", attn_moveaxis),
                     ("einsum", attn_einsum)]:
        try:
            tps, ms, cs = run(params, cfg, B, S, fn)
            print(f"{name:9s} B={B} S={S}: {tps:7.1f} tok/s "
                  f"({ms:.2f} ms/step, compile {cs:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: failed {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
