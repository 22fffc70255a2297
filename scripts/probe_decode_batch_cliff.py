#!/usr/bin/env python
"""Localize the B=64 decode cliff (round 3: 948 tok/s at B=32 vs 259 at
B=64 with the int8 cache — per-step cost grows 7x for 2x batch; the same
cliff shows as slots=32 regressing 2x in the serving sweep).

Points (one FRESH subprocess per point — the axon allocator artifact
makes 2nd-in-process big-model timings read ~210 ms/step):

  B32      control (expect ~918 tok/s, r3)
  B48      where does the cliff start?
  B64      the cliff itself (expect ~259)
  B64S96   half the cache length — is it cache-size-driven?
  B64L2    2 layers, same dims — fixed-cost/sampling vs per-layer?

    python scripts/probe_decode_batch_cliff.py           # orchestrate
    python scripts/probe_decode_batch_cliff.py B48       # one point
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = {
    "B32":    dict(B=32, S=192, layers=32),
    "B48":    dict(B=48, S=192, layers=32),
    "B64":    dict(B=64, S=192, layers=32),
    "B64S96": dict(B=64, S=96,  layers=32),
    "B64L2":  dict(B=64, S=192, layers=2),
}


def measure(point):
    import jax
    _CACHE = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench_decode_cache_variants import build_params, run
    from seed_tpu.models import llama as M

    import dataclasses
    p = POINTS[point]
    cfg = M.SEED_LLAMA_8B
    if p["layers"] != cfg.layers:
        cfg = dataclasses.replace(cfg, layers=p["layers"])
    params = jax.device_put(build_params(cfg), jax.devices()[0])
    tps, ms = run(params, cfg, p["B"], p["S"], jnp.int8)
    print(json.dumps({"point": point, **p, "tok_s": round(tps, 1),
                      "ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        measure(sys.argv[1])
    else:
        for name in POINTS:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=1800)
            out = [l for l in r.stdout.splitlines() if l.startswith("{")]
            print(out[-1] if out else
                  f'{{"point": "{name}", "error": {json.dumps(r.stderr[-300:])}}}',
                  flush=True)
