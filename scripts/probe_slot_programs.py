#!/usr/bin/env python
"""Per-program cost of the serving scheduler's device programs at the
bench shape (8B int8, slots=16, max_len=320): slot_prefill per bucket,
install+prefill, decode chunk. Attributes serving-wall regressions to
the program that moved.

    PYTHONPATH=/root/repo python scripts/probe_slot_programs.py [slots]
"""
import functools
import json
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

MAX_LEN = 320
BUCKETS = (32, 64, 128, 256)


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from seed_tpu.models import llama as M
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from bench_serving import build_params
    cfg = M.SEED_LLAMA_8B
    params = build_params(cfg)
    cache = M.init_slot_cache(cfg, slots, MAX_LEN, jnp.bfloat16)

    prefill = jax.jit(functools.partial(M.slot_prefill, cfg=cfg),
                      donate_argnums=(4,))
    steps_fn = jax.jit(functools.partial(M.slot_decode_sample_steps, cfg=cfg),
                       donate_argnums=(6,), static_argnames=("top_k", "steps"))

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    out = {"slots": slots}
    rng = np.random.RandomState(0)
    for bucket in BUCKETS:
        ids = jnp.asarray(rng.randint(5, 32000, (1, bucket), dtype=np.int32))
        n = jnp.asarray(bucket, jnp.int32)
        s0 = jnp.asarray(0, jnp.int32)
        logits, cache = prefill(params, ids, n, s0, cache)   # compile
        sync(logits)
        ts = []
        for it in range(5):
            t0 = time.perf_counter()
            logits, cache = prefill(params, ids, n,
                                    jnp.asarray(it % slots, jnp.int32), cache)
            sync(logits)
            ts.append(time.perf_counter() - t0)
        out[f"prefill_b{bucket}_ms"] = round(sorted(ts)[2] * 1e3, 1)
        print(f"prefill bucket={bucket}: {out[f'prefill_b{bucket}_ms']} ms",
              flush=True)

    tok = jnp.asarray(rng.randint(5, 32000, slots, dtype=np.int32))
    active = jnp.ones((slots,), bool)
    temps = jnp.ones((slots,), jnp.float32)
    tops = jnp.full((slots,), 0.5, jnp.float32)
    greedy = jnp.zeros((slots,), bool)
    keys = jnp.asarray(rng.randint(0, 2**31, (slots, 2), dtype=np.uint32))
    ctr = jnp.zeros((slots,), jnp.int32)
    for steps in (1, 16):
        toks, cache = steps_fn(params, tok, active, temps, tops, greedy,
                               cache, keys, ctr, steps=steps, top_k=0)
        sync(toks)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            toks, cache = steps_fn(params, tok, active, temps, tops, greedy,
                                   cache, keys, ctr, steps=steps, top_k=0)
            sync(toks)
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        out[f"decode_chunk{steps}_ms"] = round(dt * 1e3, 1)
        out[f"decode_chunk{steps}_ms_per_step"] = round(dt / steps * 1e3, 2)
        print(f"decode chunk={steps}: {dt*1e3:.1f} ms "
              f"({dt/steps*1e3:.2f} ms/step, "
              f"{slots*steps/dt:.0f} tok/s aggregate)", flush=True)

    # A/B: the round-4 sampling scheme (ONE shared key, split in-scan)
    # vs the per-request fold_in keys — isolates the sampling change
    # from the layout change.
    from seed_tpu.ops.sampling import sample_batched

    def steps_shared(params, tok0, active, temperature, top_p, greedy,
                     cache, key, steps):
        def body(carry, _):
            tok, c, k = carry
            k, sub = jax.random.split(k)
            logits, c = M.slot_decode(params, tok[:, None], active, c, cfg)
            ntok = sample_batched(sub, logits, temperature, top_p, greedy)
            return (ntok, c, k), ntok
        (_, cache, _), toks = jax.lax.scan(body, (tok0, cache, key), None,
                                           length=steps)
        return toks, cache

    shared_fn = jax.jit(steps_shared, donate_argnums=(6,),
                        static_argnames=("steps",))
    k0 = jax.random.PRNGKey(0)
    toks, cache = shared_fn(params, tok, active, temps, tops, greedy,
                            cache, k0, steps=16)
    sync(toks)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        toks, cache = shared_fn(params, tok, active, temps, tops, greedy,
                                cache, k0, steps=16)
        sync(toks)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    out["decode_chunk16_sharedkey_ms"] = round(dt * 1e3, 1)
    print(f"decode chunk=16 SHARED-KEY: {dt*1e3:.1f} ms "
          f"({dt/16*1e3:.2f} ms/step)", flush=True)
    print("slotprobe " + json.dumps(out))


if __name__ == "__main__":
    main()
