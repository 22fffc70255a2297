#!/usr/bin/env python
"""Served throughput of the continuous-batching scheduler on the chip.

VERDICT r03 next #2: the scheduler + prefix cache (serving/scheduler.py)
is the repo's flagship beyond-parity serving feature vs the reference's
one-request-at-a-time HF generate loop
(/root/reference/gradio_demo/seed_llama_flask.py:172) — this gives it an
on-chip number: 8B int8 weights, mixed prompt lengths and generation
budgets, slots/chunk sweep, prefix cache on/off.

Methodology: one subprocess per point (allocator artifact, see
bench_decode_int8cache.py); a warmup workload first exercises every
prefill bucket + decode program on the SAME batcher instance (jit caches
live on the instance), then the timed workload drains from a fresh queue.
Every decode step already lands one [slots] host transfer, so the wall
clock is honestly synced by construction.

    python scripts/bench_serving.py                 # orchestrate sweep
    python scripts/bench_serving.py 16 8 off        # slots chunk prefix
"""
import json
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

MAX_LEN = 320
BUCKETS = (32, 64, 128, 256)
N_REQUESTS = 64
PREFIX_LEN = 48          # shared system prompt (prefix-cache target)


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


def make_workload(n, rng, prefix):
    """Deterministic mixed workload: 40% short, 40% medium, 20% long
    prompts; generation budgets 32/64/96; reference sampling defaults
    (t=1.0, top_p=0.5), eos disabled so token counts are comparable
    across configurations."""
    from seed_tpu.serving import GenerationConfig
    reqs = []
    for _ in range(n):
        r = rng.rand()
        if r < 0.4:
            plen = rng.randint(8, 33)
        elif r < 0.8:
            plen = rng.randint(48, 97)
        else:
            plen = rng.randint(120, 161)
        prompt = prefix + list(rng.randint(5, 32000, plen))
        gen = GenerationConfig(
            max_new_tokens=int(rng.choice([32, 64, 96])),
            temperature=1.0, top_p=0.5, do_sample=True, eos_token_id=-1)
        reqs.append((prompt, gen))
    return reqs


def run_point(slots, chunk, prefix_on):
    from seed_tpu.models import llama as M
    from seed_tpu.serving import GenerationConfig
    from seed_tpu.serving.scheduler import ContinuousBatcher
    cfg = M.SEED_LLAMA_8B
    params = build_params(cfg)
    cb = ContinuousBatcher(params, cfg, slots=slots, max_len=MAX_LEN,
                           prompt_buckets=BUCKETS, decode_chunk=chunk)
    rng = np.random.RandomState(7)
    prefix = list(np.random.RandomState(3).randint(5, 32000, PREFIX_LEN))
    if prefix_on:
        cb.register_prefix(prefix)

    # warmup: one request per bucket boundary + chunk tail sizes, compiles
    # every program the timed run needs (prefill per bucket, prefill_at
    # when the prefix path is on, decode chunks at every pow2 <= chunk)
    warm_gen = GenerationConfig(max_new_tokens=max(2 * chunk - 1, 3),
                                temperature=1.0, top_p=0.5,
                                do_sample=True, eos_token_id=-1)
    for b in BUCKETS:
        if b >= MAX_LEN:
            continue
        plen = min(b, MAX_LEN - warm_gen.max_new_tokens - 2)
        cb.submit(prefix + list(rng.randint(5, 32000, max(plen - PREFIX_LEN, 1))),
                  warm_gen)
    cb.run()
    cb.finished.clear()

    reqs = make_workload(N_REQUESTS, np.random.RandomState(0), prefix)
    rids = [cb.submit(p, g) for p, g in reqs]
    steps = 0
    t0 = time.perf_counter()
    while cb.has_work():
        cb.step()
        steps += 1
    wall = time.perf_counter() - t0
    out = {rid: cb.finished[rid].tokens for rid in rids}
    gen_tok = sum(len(t) for t in out.values())
    prompt_tok = sum(len(p) for p, _ in reqs)
    return {
        "slots": slots, "chunk": chunk, "prefix": prefix_on,
        "requests": N_REQUESTS, "wall_s": round(wall, 2),
        "gen_tok": gen_tok, "prompt_tok": prompt_tok,
        "served_tok_s": round(gen_tok / wall, 1),
        "req_per_min": round(N_REQUESTS / wall * 60, 1),
        "dispatch_loops": steps,
    }


SWEEP = [(8, 1, False), (16, 1, False), (16, 8, False), (16, 16, False),
         (32, 16, False), (16, 16, True)]

if __name__ == "__main__":
    if len(sys.argv) == 4:
        slots, chunk = int(sys.argv[1]), int(sys.argv[2])
        prefix_on = sys.argv[3] == "on"
        print("serve " + json.dumps(run_point(slots, chunk, prefix_on)),
              flush=True)
    else:
        for slots, chunk, prefix_on in SWEEP:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(slots),
                 str(chunk), "on" if prefix_on else "off"],
                capture_output=True, text=True, timeout=5400)
            line = [l for l in r.stdout.splitlines() if l.startswith("serve")]
            print(line[0] if line else
                  f"serve slots={slots} chunk={chunk} FAILED "
                  f"{r.stderr.strip().splitlines()[-1][:300] if r.stderr.strip() else '?'}",
                  flush=True)
