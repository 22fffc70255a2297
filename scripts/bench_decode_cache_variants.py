#!/usr/bin/env python
"""8B int8 decode throughput: bf16 KV cache vs int8 KV cache.

The int8 cache halves cache HBM traffic AND residency — at B=32 S=192
the bf16 cache is 2x ~1.2GB of the ~21GB/step HBM bound (weights 7GB
dominate); the bigger win is headroom: int8 cache at S=384 fits where
bf16 S=192 was the ceiling.

    python scripts/bench_decode_cache_variants.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from seed_tpu.models import llama as M
from seed_tpu.ops.quantization import quantize_tree


def build_params(cfg):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        shapes = jax.eval_shape(
            lambda k: quantize_tree(M.init_llama(k, cfg, jnp.bfloat16)),
            jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.asarray(rng.randint(-127, 128, size=s.shape,
                                               dtype=np.int8))
            return jnp.asarray(np.full(s.shape, 0.01, np.float32), s.dtype)

        return jax.tree.map(fill, shapes)


def run(params, cfg, B, S, cache_dtype, steps=64, prompt_len=32):
    loop = jax.jit(functools.partial(
        M.decode_loop, cfg=cfg, steps=steps, temperature=1.0, top_p=0.0,
        eos_id=-1), donate_argnums=(2,))
    cache = M.init_cache(cfg, B, S, dtype=cache_dtype)
    cache = cache._replace(
        valid=cache.valid.at[:, :prompt_len].set(True),
        index=jnp.asarray(prompt_len, jnp.int32))
    tok = jnp.ones((B,), jnp.int32)
    key = jax.random.PRNGKey(0)
    # >=3 warmup invocations then median of 3: one warmup is NOT enough
    # through the axon tunnel — the first invocations of a
    # freshly-compiled program read 5-10x slow (the r03 bench
    # under-reported decode 10x this way, and an r04 probe misread a
    # 10x "batch cliff" that was entirely this artifact)
    for _ in range(3):
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        tok = toks[:, -1]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        times.append(time.perf_counter() - t0)
        tok = toks[:, -1]
    dt = sorted(times)[1]
    del cache
    return B * steps / dt, dt / steps * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = M.SEED_LLAMA_8B
    params = jax.device_put(build_params(cfg), jax.devices()[0])
    for tag, B, S, dt_ in [
        ("bf16 cache S=192", 32, 192, jnp.bfloat16),
        ("int8 cache S=192", 32, 192, jnp.int8),
        ("int8 cache S=384", 32, 384, jnp.int8),
    ]:
        try:
            tps, ms = run(params, cfg, B, S, dt_)
            print(f"{tag}: {tps:7.1f} tok/s  ({ms:.1f} ms/step)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
