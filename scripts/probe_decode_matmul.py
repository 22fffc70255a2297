#!/usr/bin/env python
"""Probe: is the 8B decode step bound by XLA's M=32 matmul rate?

Times ONLY the per-layer projection chain of a decode step — the 7
int8-weight matmuls (q/k/v/o [4096,4096], gate/up [4096,11008], down
[11008,4096]) exactly as the production non-kernel path computes them
(``(x @ wq.astype(bf16)) * scale``, models/layers.py:37-49) — scanned
over the 32 stacked layers inside one compiled program, no attention,
no cache, no sampling.

If this bare chain accounts for most of the measured 34.5 ms/step
(PERF.md round 3), the decode bound is the achievable M=32 matmul
throughput, i.e. a compiler/hardware property not addressable from the
graph. Weight bytes per sweep: 6.48 GB int8 -> 7.9 ms at the 819 GB/s
HBM roofline.

    python scripts/probe_decode_matmul.py [M ...]   # default 32 64 128
"""
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

DIM, FFN, LAYERS = 4096, 11008, 32
SWEEPS = 8  # full-model weight sweeps per timed program


def build_weights():
    rng = np.random.RandomState(0)
    mk = lambda *s: jnp.asarray(rng.randint(-127, 128, s, dtype=np.int8))
    sc = lambda n: jnp.full((LAYERS, n), 0.01, jnp.float32)
    return {
        "qkvo": mk(LAYERS, 4, DIM, DIM), "qkvo_s": sc(4 * DIM).reshape(LAYERS, 4, DIM),
        "gate_up": mk(LAYERS, 2, DIM, FFN), "gate_up_s": sc(2 * FFN).reshape(LAYERS, 2, FFN),
        "down": mk(LAYERS, FFN, DIM), "down_s": sc(DIM),
    }


def chain_ms(M, w):
    x0 = jnp.asarray(np.random.RandomState(1).randn(M, DIM), jnp.bfloat16)

    def layer(x, lw):
        qkvo, qkvo_s, gu, gu_s, dn, dn_s = lw
        outs = []
        for i in range(4):   # q, k, v, o — four [4096,4096] streams
            outs.append((x @ qkvo[i].astype(x.dtype)) * qkvo_s[i].astype(x.dtype))
        h = outs[0] + outs[1] + outs[2] + outs[3]          # keep all live
        g = (h @ gu[0].astype(x.dtype)) * gu_s[0].astype(x.dtype)
        u = (h @ gu[1].astype(x.dtype)) * gu_s[1].astype(x.dtype)
        d = ((jax.nn.silu(g) * u) @ dn.astype(x.dtype)) * dn_s.astype(x.dtype)
        return x + d, None

    @jax.jit
    def sweep(x, w):
        def one(x, _):
            y, _ = jax.lax.scan(
                layer, x,
                (w["qkvo"], w["qkvo_s"], w["gate_up"], w["gate_up_s"],
                 w["down"], w["down_s"]))
            return y, None
        y, _ = jax.lax.scan(one, x, None, length=SWEEPS)
        return y

    sweep_w = lambda x: sweep(x, w)
    y = sweep_w(x0)
    np.asarray(y[0, 0])                      # tunnel-safe sync
    t0 = time.perf_counter()
    y = sweep_w(x0)
    np.asarray(y[0, 0])
    ms = (time.perf_counter() - t0) / SWEEPS * 1e3
    wbytes = sum(int(np.prod(w[k].shape)) for k in ("qkvo", "gate_up", "down"))
    gbs = wbytes / (ms / 1e3) / 2**30
    print(f"M={M:4d}: {ms:6.2f} ms per 32-layer projection sweep "
          f"({gbs:5.0f} GiB/s weight stream)", flush=True)
    return ms


if __name__ == "__main__":
    Ms = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    # weights as device_put'ed jit ARGS, not captured constants — a
    # 6.48GB constant tree makes lowering+upload through the tunnel
    # pathological (>25 min, observed)
    w = jax.device_put(build_weights(), jax.devices()[0])
    jax.block_until_ready(w)
    for M in Ms:
        chain_ms(M, w)
