#!/usr/bin/env python
"""Microbench: int8 vs bf16 matmul at EVA-ViT-g shapes, then full W8A8
encode throughput + token-id agreement vs the bf16 path.

Run on the real chip (exclusive — no other python on the tunnel):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_int8_vit.py
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_matmuls():
    # EVA-ViT-g block shapes at batch 64: M = 64*257 = 16448
    rng = np.random.RandomState(0)
    for (M, K, N, tag) in [
        (16448, 1408, 4224, "qkv"),
        (16448, 1408, 6144, "fc1"),
        (16448, 6144, 1408, "fc2"),
        (8192, 8192, 8192, "square"),
    ]:
        x16 = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        w16 = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
        x8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

        f_bf16 = jax.jit(lambda a, b: a @ b)
        f_int8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        flops = 2 * M * K * N
        t16 = timeit(f_bf16, x16, w16)
        t8 = timeit(f_int8, x8, w8)
        print(f"{tag:7s} M={M} K={K} N={N}: bf16 {flops/t16/1e12:7.1f} TF/s"
              f"  int8 {flops/t8/1e12:7.1f} TOP/s  speedup {t16/t8:.2f}x",
              flush=True)


def bench_encode():
    from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
    from seed_tpu.models.seed_tokenizer import quantize_for_serving
    from seed_tpu.ops.preprocess import preprocess

    cfg = SEED_TOKENIZER
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qparams, qcfg = quantize_for_serving(params, cfg)
    params = jax.device_put(params, jax.devices()[0])
    qparams = jax.device_put(qparams, jax.devices()[0])

    def enc(c):
        @jax.jit
        def f(p, raw_u8):
            imgs = preprocess(raw_u8, image_size=c.vit.image_size,
                              dtype=jnp.bfloat16)
            return encode(p, imgs, c)
        return f

    f16, f8 = enc(cfg), enc(qcfg)
    for batch in (64, 128):
        raw = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, size=(batch, 224, 224, 3)).astype(np.uint8))
        ids16 = np.asarray(f16(params, raw))
        ids8 = np.asarray(f8(qparams, raw))
        agree = (ids16 == ids8).mean()
        t16 = timeit(f16, params, raw, iters=8)
        t8 = timeit(f8, qparams, raw, iters=8)
        print(f"encode B={batch}: bf16 {batch/t16:6.1f} img/s  "
              f"w8a8 {batch/t8:6.1f} img/s  speedup {t16/t8:.2f}x  "
              f"token-id agreement {agree:.4f}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    if "--matmuls" in sys.argv:
        bench_matmuls()
    bench_encode()
