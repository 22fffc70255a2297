#!/usr/bin/env python
"""Probe: Pallas w8a8_matmul vs XLA int8 dot at the EVA-ViT encode shapes.

Same in-graph fori_loop methodology as probe_int8_shapes.py (int8-carry
feedback so iterations can't be elided), B=64 encode shapes. Optional
block-size sweep via W8A8_BM/W8A8_BN/W8A8_BK env vars.
"""
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

from seed_tpu.ops.int8_matmul import w8a8_matmul

ITERS = 20
BM = int(os.environ.get("W8A8_BM", "512"))
BN = int(os.environ.get("W8A8_BN", "1536"))
BK = int(os.environ.get("W8A8_BK", "2048"))


def rate(M, K, N, use_kernel):
    rng = np.random.RandomState(0)
    wq = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    ws = jnp.full((N,), 0.01, jnp.float32)
    x0 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    xs = jnp.full((M, 1), 0.02, jnp.float32)

    if use_kernel:
        def body(i, x):
            y = w8a8_matmul(x, xs, wq, ws, out_dtype=jnp.bfloat16,
                            block_m=BM, block_n=BN, block_k=BK)
            return (y[:, :K] * 100).astype(jnp.int8)
    else:
        def body(i, x):
            y = jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)
            return (y[:, :K] * 100).astype(jnp.int8)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = loop(x0)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    out = loop(x0)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    return 2 * M * K * N / dt / 1e12


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  blocks bm={BM} bn={BN} bk={BK}",
          flush=True)
    shapes = [
        ("vit qkv ", 16448, 1408, 4224),
        ("vit proj", 16448, 1408, 1408),
        ("vit fc1 ", 16448, 1408, 6144),
        ("vit fc2 ", 16448, 6144, 1408),
    ]
    for tag, M, K, N in shapes:
        try:
            rx = rate(M, K, N, use_kernel=False)
            rk = rate(M, K, N, use_kernel=True)
            print(f"{tag} M={M} K={K:5d} N={N:5d}: "
                  f"xla {rx:6.1f} TOP/s  pallas {rk:6.1f} TOP/s  "
                  f"({rk/rx:.2f}x)", flush=True)
        except Exception as e:
            print(f"{tag}: failed {type(e).__name__}: {e}", flush=True)
