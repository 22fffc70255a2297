#!/usr/bin/env python
"""Served throughput + per-request latency of the continuous-batching
scheduler on the chip.

The scheduler (serving/scheduler.py) is the repo's flagship
beyond-parity serving feature vs the reference's one-request-at-a-time
HF generate loop (/root/reference/gradio_demo/seed_llama_flask.py:172).
This gives it on-chip numbers: 8B int8 weights, mixed prompt lengths and
generation budgets, slots/chunk sweep, prefix cache off/on/on512.

Reported per point (VERDICT r04 next #2 — a throughput-only claim with a
deliberate tail-latency trade is half a measurement):
- served_tok_s / req_per_min (aggregate throughput)
- ttft_ms p50/p95: submit -> first token (queue wait + prefill)
- e2e_ms p50/p95: submit -> last token delivered (chunked decode holds
  finished slots up to chunk-1 extra steps and admits only between
  chunks — the latency cost of the 1.7x chunking throughput lever)

Methodology: one subprocess per point (allocator artifact, see
bench_decode_int8cache.py); a warmup workload first exercises every
prefill bucket + decode program on the SAME batcher instance (jit caches
live on the instance), then the timed workload drains from a fresh queue.
Every decode step already lands one [slots] host transfer, so the wall
clock is honestly synced by construction.

    python scripts/bench_serving.py                 # orchestrate sweep
    python scripts/bench_serving.py 16 16 off       # slots chunk prefix
    python scripts/bench_serving.py 16 16 on512     # 512-tok system prompt
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

N_REQUESTS = 64


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


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def run_point(slots, chunk, prefix_mode, cache="bf16"):
    from seed_tpu.models import llama as M
    from seed_tpu.serving import GenerationConfig
    from seed_tpu.serving.scheduler import ContinuousBatcher
    cfg = M.SEED_LLAMA_8B
    prefix_len = {"off": 48, "on": 48, "off512": 512, "on512": 512}[prefix_mode]
    max_len = 320 if prefix_len <= 48 else 832
    buckets = (32, 64, 128, 256) if prefix_len <= 48 \
        else (32, 64, 128, 256, 512)
    # slots=64 x S=320 bf16 is a 10.7 GiB cache — over the chip's HBM next
    # to the 6.7 GiB int8 weights; fp8 (e4m3) halves it (the KVCache
    # engine's serving default, PERF.md round 3, applied to the slot pool)
    cache_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn}[cache]
    params = build_params(cfg)
    cb = ContinuousBatcher(params, cfg, slots=slots, max_len=max_len,
                           prompt_buckets=buckets, decode_chunk=chunk,
                           cache_dtype=cache_dtype)
    rng = np.random.RandomState(7)
    prefix = list(np.random.RandomState(3).randint(5, 32000, prefix_len))
    if not prefix_mode.startswith("off"):
        cb.register_prefix(prefix)

    # warmup: one request per bucket boundary + chunk tail sizes, compiles
    # every program the timed run needs (prefill per bucket, the fused
    # install+prefill when the prefix path is on, decode chunks at every
    # pow2 <= chunk)
    warm_gen = GenerationConfig(max_new_tokens=max(2 * chunk - 1, 3),
                                temperature=1.0, top_p=0.5,
                                do_sample=True, eos_token_id=-1)
    for b in buckets:
        if b >= max_len:
            continue
        plen = min(b, max_len - warm_gen.max_new_tokens - 2)
        cb.submit(prefix + list(rng.randint(5, 32000,
                                            max(plen - prefix_len, 1))),
                  warm_gen)
    cb.run()
    if not prefix_mode.startswith("off"):
        # the prefix path runs THREE distinct programs per remainder
        # bucket: install+prefill (first hit on a slot), slot_prefill_at
        # (slot-reuse hit), and the from-0 prefill. The wave above only
        # compiled the install path at the remainder buckets it happened
        # to produce — cover every (program, bucket) pair the timed run
        # can dispatch, or the timed numbers eat the missing compiles.
        rem_buckets = [b for b in buckets if prefix_len + b <= max_len]

        def _rem_wave():
            for b in rem_buckets:
                rem = min(b, max_len - prefix_len - warm_gen.max_new_tokens - 2)
                if rem < 1:
                    continue
                cb.submit(prefix + list(rng.randint(5, 32000, rem)), warm_gen)
            cb.run()

        _rem_wave()                      # slots hold the prefix: slot-reuse
                                         # path -> slot_prefill_at per bucket
        for s in range(cb.slots):
            cb.slot_prefix[s] = None
        _rem_wave()                      # fresh slots: fused install per bucket
    cb.finished.clear()
    for s in range(cb.slots):       # warm slots hold the prefix: reset so
        cb.slot_prefix[s] = None    # the timed run pays real installs

    reqs = make_workload(N_REQUESTS, np.random.RandomState(0), prefix)
    rids = [cb.submit(p, g) for p, g in reqs]
    steps = 0
    t0 = time.perf_counter()
    while cb.has_work():
        cb.step()
        steps += 1
    wall = time.perf_counter() - t0
    fin = [cb.finished[rid] for rid in rids]
    gen_tok = sum(len(r.tokens) for r in fin)
    prompt_tok = sum(len(p) for p, _ in reqs)
    ttft = [(r.t_first - r.t_submit) * 1e3 for r in fin]
    e2e = [(r.t_done - r.t_submit) * 1e3 for r in fin]
    return {
        "slots": slots, "chunk": chunk, "prefix": prefix_mode,
        "cache": cache,
        "requests": N_REQUESTS, "wall_s": round(wall, 2),
        "gen_tok": gen_tok, "prompt_tok": prompt_tok,
        "served_tok_s": round(gen_tok / wall, 1),
        "req_per_min": round(N_REQUESTS / wall * 60, 1),
        "ttft_ms_p50": round(_pct(ttft, 50), 1),
        "ttft_ms_p95": round(_pct(ttft, 95), 1),
        "e2e_ms_p50": round(_pct(e2e, 50), 1),
        "e2e_ms_p95": round(_pct(e2e, 95), 1),
        "dispatch_loops": steps,
    }


SWEEP = [(8, 16, "off", "bf16"), (16, 1, "off", "bf16"),
         (16, 8, "off", "bf16"), (16, 16, "off", "bf16"),
         (32, 16, "off", "bf16"), (64, 16, "off", "fp8"),
         (16, 16, "on", "bf16"), (16, 16, "off512", "bf16"),
         (16, 16, "on512", "bf16"), (16, 16, "off", "bf16")]

if __name__ == "__main__":
    if len(sys.argv) >= 4:
        slots, chunk = int(sys.argv[1]), int(sys.argv[2])
        cache = sys.argv[4] if len(sys.argv) > 4 else "bf16"
        print("serve " + json.dumps(run_point(slots, chunk, sys.argv[3],
                                              cache)),
              flush=True)
    else:
        points = SWEEP
        if len(sys.argv) == 2 and sys.argv[1] != "all":
            points = [tuple(p.split(":")) for p in sys.argv[1].split(",")]
            points = [(int(a), int(b), c, d[0] if d else "bf16")
                      for a, b, c, *d in points]
        for slots, chunk, prefix_mode, cache in points:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(slots),
                 str(chunk), prefix_mode, cache],
                capture_output=True, text=True, timeout=5400)
            line = [l for l in r.stdout.splitlines() if l.startswith("serve")]
            print(line[0] if line else
                  f"serve slots={slots} chunk={chunk} prefix={prefix_mode} "
                  f"cache={cache} FAILED "
                  f"{r.stderr.strip().splitlines()[-1][:300] if r.stderr.strip() else '?'}",
                  flush=True)
