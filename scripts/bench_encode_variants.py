#!/usr/bin/env python
"""The encode agreement/throughput frontier (VERDICT r03 next #7).

Every serving lever measured SEPARATELY and in combination against the
exact bf16 path, full scale on the chip, with deterministic seeds:

  - flash        Pallas short-seq attention, fast epilogue
  - flash_exact  same kernel, op-faithful epilogue (probe_exact_attn.py)
  - tanh         tanh GELU instead of exact erf
  - w8a8         int8 weights AND activations on the ViT hot matmuls

Agreement is a per-batch random variable (flips concentrate at VQ
near-ties of the random init codebook — see probe_exact_attn.py's margin
analysis), so it is reported as mean/std/min over ``--batches`` disjoint
fixed-seed batches: the spread explains the r03 0.9639-vs-0.9497 "drift"
(two single-batch samples of this distribution).

Timing: per-iteration host sync, median of ``--iters``.

    PYTHONPATH=/root/repo python scripts/bench_encode_variants.py
"""
import argparse
import dataclasses
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    B = args.batch
    cfg = SEED_TOKENIZER
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
        qparams, qcfg = quantize_for_serving(params, cfg)
    params = jax.device_put(params, jax.devices()[0])
    qparams = jax.device_put(qparams, jax.devices()[0])

    vit = lambda c, **kw: dataclasses.replace(
        c, vit=dataclasses.replace(c.vit, **kw))
    variants = [
        ("bf16_exact", params, cfg),
        ("flash", params, vit(cfg, use_flash=True)),
        ("flash_exact", params, vit(cfg, use_flash=True, flash_exact=True)),
        ("tanh", params, vit(cfg, act="gelu_tanh")),
        ("w8a8", qparams, qcfg),
        ("w8a8_flash", qparams, vit(qcfg, use_flash=True)),
        ("w8a8_flash_tanh", qparams,
         vit(qcfg, use_flash=True, act="gelu_tanh")),
    ]

    corpus = [jnp.asarray(np.random.RandomState(100 + b).randint(
        0, 256, (B, 224, 224, 3), dtype=np.uint8))
        for b in range(args.batches)]
    timing_raw = corpus[0]

    results = {}
    ref_ids = None
    for tag, p, c in variants:
        fn = enc_fn(c)
        ids = [np.asarray(fn(p, raw)) for raw in corpus]
        # timing: 2 warmups (compile happened above), per-iter sync, median
        np.asarray(fn(p, timing_raw))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(fn(p, timing_raw))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        if ref_ids is None:
            ref_ids = ids
        per_batch = np.asarray([(a == r).mean()
                                for a, r in zip(ids, ref_ids)])
        results[tag] = {
            "img_s": round(B / dt, 1),
            "agreement_mean": round(float(per_batch.mean()), 4),
            "agreement_std": round(float(per_batch.std()), 4),
            "agreement_min": round(float(per_batch.min()), 4),
        }
        print(f"# {tag:16s} {B/dt:6.1f} img/s  agree "
              f"{per_batch.mean():.4f} +/- {per_batch.std():.4f} "
              f"(min {per_batch.min():.4f})", flush=True)
    print(json.dumps({"batch": B, "batches": args.batches,
                      "n_tokens_per_batch": int(ref_ids[0].size),
                      "frontier": results}))


if __name__ == "__main__":
    main()
