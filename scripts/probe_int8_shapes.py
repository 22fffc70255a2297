#!/usr/bin/env python
"""Probe: which matmul shapes hit the v5e int8 MXU rate?

Times each matmul INSIDE one compiled program (lax.fori_loop with an
int8-carry feedback so iterations can't be elided or overlapped with
dispatch), removing the ~2.4ms/dispatch tunnel overhead that polluted the
first microbench. Prints TF/s (bf16) vs TOP/s (int8) per shape.
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

ITERS = 20


def rate(M, K, N, dtype):
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), dtype) if dtype == jnp.int8 \
        else jnp.asarray(rng.randn(K, N), dtype)
    x0 = jnp.asarray(rng.randint(-127, 128, (M, K)), dtype) if dtype == jnp.int8 \
        else jnp.asarray(rng.randn(M, K), dtype)

    if dtype == jnp.int8:
        def body(i, x):
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # cheap feedback: derive the next int8 x from y (data dependence)
            nxt = (y[:, :K] >> jnp.int32(8)).astype(jnp.int8)
            return nxt
    else:
        def body(i, x):
            y = x @ w
            return y[:, :K].astype(dtype)

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, ITERS, body, x)

    out = loop(x0)
    np.asarray(out[0, 0])                     # sync after compile+warmup
    t0 = time.perf_counter()
    out = loop(x0)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    return 2 * M * K * N / dt / 1e12


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    shapes = [
        ("vit qkv      ", 16448, 1408, 4224),
        ("vit fc1      ", 16448, 1408, 6144),
        ("vit fc2      ", 16448, 6144, 1408),
        ("K pad 1536   ", 16448, 1536, 4224),
        ("K pad 2048   ", 16448, 2048, 4224),
        ("M pow2       ", 16384, 1408, 4224),
        ("pow2 all     ", 16384, 2048, 4096),
        ("square 4096  ", 4096, 4096, 4096),
        ("square 8192  ", 8192, 8192, 8192),
    ]
    for tag, M, K, N in shapes:
        try:
            r16 = rate(M, K, N, jnp.bfloat16)
            r8 = rate(M, K, N, jnp.int8)
            print(f"{tag} M={M:6d} K={K:5d} N={N:5d}: "
                  f"bf16 {r16:7.1f} TF/s  int8 {r8:7.1f} TOP/s  "
                  f"ratio {r8/r16:.2f}x", flush=True)
        except Exception as e:
            print(f"{tag}: failed {type(e).__name__}: {e}", flush=True)
