#!/usr/bin/env python
"""Encode throughput across serving variants: bf16, +flash-attention,
+W8A8, both. Token-id agreement measured against plain bf16.

    python scripts/bench_encode_variants.py
"""
import dataclasses
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

from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
from seed_tpu.models.seed_tokenizer import quantize_for_serving
from seed_tpu.ops.preprocess import preprocess


def enc_fn(c):
    @jax.jit
    def f(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=c.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, c)
    return f


def timeit(fn, p, raw, iters=8):
    ids = np.asarray(fn(p, raw))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(p, raw)
    np.asarray(fn(p, raw))
    return ids, (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    B = 64
    cfg = SEED_TOKENIZER
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qparams, qcfg = quantize_for_serving(params, cfg)
    params = jax.device_put(params, jax.devices()[0])
    qparams = jax.device_put(qparams, jax.devices()[0])
    raw = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(B, 224, 224, 3)).astype(np.uint8))

    flash = lambda c: dataclasses.replace(
        c, vit=dataclasses.replace(c.vit, use_flash=True))
    tanh = lambda c: dataclasses.replace(
        c, vit=dataclasses.replace(c.vit, act="gelu_tanh"))

    variants = [
        ("bf16                ", params, cfg),
        ("bf16 + flash        ", params, flash(cfg)),
        ("w8a8                ", qparams, qcfg),
        ("w8a8 + flash        ", qparams, flash(qcfg)),
        ("w8a8 + flash + tanh ", qparams, tanh(flash(qcfg))),
    ]
    ref_ids = None
    for tag, p, c in variants:
        ids, dt = timeit(enc_fn(c), p, raw)
        if ref_ids is None:
            ref_ids = ids
        agree = (ids == ref_ids).mean()
        print(f"{tag}: {B/dt:6.1f} img/s ({dt*1e3:.0f} ms)  "
              f"agreement {agree:.4f}", flush=True)
