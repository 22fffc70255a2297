#!/usr/bin/env python
"""8B int8-weight decode throughput: bf16 vs fp8/int8 KV cache, batch and
context sweep. Quantized caches halve cache HBM -> fit 2x batch or
context (the aggregate-throughput lever on one 16GB v5e).

EVERY CONFIG RUNS IN ITS OWN SUBPROCESS: any config measured as the 2nd+
big model inside one process reads ~210+ ms/step regardless of what it is
(allocator/fragmentation artifact, PERF.md round 2-3 — it manufactured
the round-2 "B=64 collapse"). One process per point gives clean numbers.

    python scripts/bench_decode_int8cache.py            # orchestrate sweep
    python scripts/bench_decode_int8cache.py bf16 32 192  # one point
"""
import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_params(cfg):
    from seed_tpu.models import llama as M
    from seed_tpu.ops.quantization import quantize_tree
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

        params = jax.tree.map(fill, shapes)
    return jax.device_put(params, jax.devices()[0])


def run(params, cfg, B, S, cache_dtype, steps=64, prompt_len=32):
    from seed_tpu.models import llama as M
    loop = jax.jit(functools.partial(
        M.decode_loop, cfg=cfg, steps=steps, temperature=1.0, top_p=0.5,
        eos_id=-1), donate_argnums=(2,))
    cache = M.init_cache(cfg, B, S, dtype=cache_dtype)
    cache = cache._replace(
        valid=cache.valid.at[:, :prompt_len].set(True),
        index=jnp.asarray(prompt_len, jnp.int32))
    tok = jnp.ones((B,), jnp.int32)
    key = jax.random.PRNGKey(0)
    for _ in range(2):   # compile + cold-read warmup (PERF.md methodology)
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        tok = toks[:, -1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])
        ts.append(time.perf_counter() - t0)
        tok = toks[:, -1]
    dt = sorted(ts)[1]
    return B * steps / dt, dt / steps * 1e3


DTYPES = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn, "int8": jnp.int8}

# "bf16+w8a8": bf16 cache, cfg.w8a8=True — every projection through the
# int8 x int8 MXU dot so the weight stream is pure int8 (no bf16 dequant
# materialization, the round-2 per-layer residue suspect).
SWEEP = [("bf16", 32, 192), ("bf16+w8a8", 32, 192), ("bf16", 64, 192),
         ("fp8", 32, 192), ("fp8", 64, 192), ("fp8", 64, 448),
         ("int8", 32, 192)]

if __name__ == "__main__":
    if len(sys.argv) >= 4:      # one point, clean process
        dt_name, B, S = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
        model = sys.argv[4] if len(sys.argv) > 4 else "8b"
        import dataclasses
        from seed_tpu.models import llama as M
        cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B}[model]
        cache_name = dt_name
        if dt_name.endswith("+w8a8"):
            cfg = dataclasses.replace(cfg, w8a8=True)
            cache_name = dt_name[:-len("+w8a8")]
        params = build_params(cfg)
        tps, ms = run(params, cfg, B, S, DTYPES[cache_name])
        print(f"model={model} cache={dt_name} B={B} S={S}: {tps:7.1f} tok/s "
              f"({ms:.1f} ms/step)", flush=True)
    else:                       # orchestrate: one subprocess per point
        import jax as _j
        print(f"device: {_j.devices()[0]}", flush=True)
        for (dt_name, B, S) in SWEEP:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), dt_name,
                 str(B), str(S)], capture_output=True, text=True,
                timeout=3600)
            line = [l for l in r.stdout.splitlines() if l.startswith("model")]
            print(line[0] if line else
                  f"cache={dt_name} B={B} S={S}: failed "
                  f"{r.stderr.strip().splitlines()[-1][:200] if r.stderr.strip() else '?'}",
                  flush=True)
