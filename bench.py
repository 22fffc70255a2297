#!/usr/bin/env python
"""Headline benchmark: SEED-2 tokenizer encode throughput (images/sec/chip).

Runs the full-scale encode graph (device-side preprocess + EVA-ViT-g 39
blocks + causal Q-Former + VQ argmin over 8192 codes -> 32 ids) in bf16 on
one chip, sweeping batch size, and prints ONE JSON line.

``vs_baseline`` is measured against the BASELINE.json aspiration of 5,000
images/sec/chip. (The reference repo publishes no tokenizer throughput —
see BASELINE.md; the v5e bf16 roofline for EVA-ViT-g at 224^2 is ~520
GFLOPs/image -> ~380 img/s at 100%% MFU, so the 5k figure is not physically
reachable in bf16; we report honestly against it.)
"""
import functools
import json
import os
import time

import jax

# persistent compile cache: the axon tunnel recompiles are minutes-long
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench_decode_8b():
    """Secondary metric: SEED-LLaMA-8B int8 decode tokens/sec/chip.

    Runs the full 8B decoder (int8 weight-only — the reference's 8-bit
    serving mode) with the ring KV cache on one chip. Returns tokens/sec
    or None if it doesn't fit/compile on this chip."""
    try:
        from seed_tpu.models import llama as M
        from seed_tpu.ops.quantization import quantize_tree

        cfg = M.SEED_LLAMA_8B
        # 8B bf16 (16GB) exceeds one v5e's HBM: build int8 weights host-side
        # (throughput doesn't depend on values — cheap numpy fill instead of
        # a 6.7B-sample PRNG) and ship ~8GB to the chip: the 8-bit serving
        # memory layout.
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
        B, prompt_len, steps, S = 32, 32, 64, 192
        # serving path: M.decode_loop scans `steps` decode+sample iterations
        # inside ONE compiled program (matches LlamaEngine.generate) — the
        # per-token host round trip was the round-1 bottleneck (~86 ms/step
        # vs the ~8.5 ms/step HBM roofline).
        #
        # Cache length 192: XLA re-lays-out the fused kv cache once at loop
        # entry (it prefers [L,S,H,B,2D] physical order at decode shapes),
        # costing one transient cache-sized copy; S=192 keeps
        # weights + 2x cache + relaid int8 kernels inside 15.75G HBM. The
        # AUTO-layout route that removes the copy entirely compiles 0.25G
        # of temp but currently fails to EXECUTE through the axon tunnel
        # (see PERF.md); revisit when the runtime accepts custom layouts.
        params = jax.device_put(params, jax.devices()[0])
        loop = jax.jit(functools.partial(
            M.decode_loop, cfg=cfg, steps=steps, temperature=1.0, top_p=0.5,
            eos_id=-1), donate_argnums=(2,))
        cache = M.init_cache(cfg, B, S)
        # decode throughput does not depend on cache VALUES: mark the
        # prompt region valid directly instead of paying a prefill compile
        cache = cache._replace(
            valid=cache.valid.at[:, :prompt_len].set(True),
            index=jnp.asarray(prompt_len, jnp.int32))
        tok = jnp.ones((B,), jnp.int32)
        key = jax.random.PRNGKey(0)
        toks, _, cache, key = loop(params, tok, cache, key)  # compile+warmup
        np.asarray(toks[:, -1])                              # sync
        tok = toks[:, -1]
        t0 = time.perf_counter()
        toks, _, cache, key = loop(params, tok, cache, key)
        np.asarray(toks[:, -1])                              # sync point
        dt = time.perf_counter() - t0
        return B * steps / dt
    except Exception as e:  # OOM / compile limits: report encode only
        import traceback
        print(f"# decode bench skipped: {type(e).__name__}: {e}",
              flush=True)
        traceback.print_exc()
        return None


def main():
    from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
    from seed_tpu.ops.preprocess import preprocess

    # decode first: the 8B int8 weights (7GB) + cache (4.3GB) need the chip
    # to themselves; encode's params would otherwise OOM it
    decode_tps = bench_decode_8b()

    cfg = SEED_TOKENIZER
    params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.device_put(params)

    @functools.partial(jax.jit, static_argnums=())
    def encode_u8(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=cfg.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, cfg)

    def sweep(p, fn, batches):
        res = {}
        for batch in batches:
            raw = np.random.RandomState(0).randint(
                0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
            raw = jnp.asarray(raw)
            np.asarray(fn(p, raw))  # compile + warmup
            # NOTE: device->host transfer is the sync point; on the axon
            # tunnel block_until_ready() returns before execution completes.
            n_iters = 5
            t0 = time.perf_counter()
            for _ in range(n_iters - 1):
                fn(p, raw)
            np.asarray(fn(p, raw))
            dt = (time.perf_counter() - t0) / n_iters
            res[batch] = batch / dt
        return res

    results = sweep(params, encode_u8, (16, 32, 64, 128))
    detail = {f"batch_{k}": round(v, 2) for k, v in results.items()}

    # Serving-fast variant: W8A8 int8 matmuls (the reference's 8-bit
    # serving mode) + Pallas short-seq attention + tanh GELU — each lever
    # measured separately in PERF.md round 2 (token-id agreement vs exact
    # bf16: 96-97% per lever). Measured at the best bf16 batch.
    from seed_tpu.models.seed_tokenizer import (quantize_for_serving,
                                                serving_fast_config)
    qparams, qcfg = quantize_for_serving(params, cfg)
    qcfg = serving_fast_config(qcfg)
    qparams = jax.device_put(qparams)

    @jax.jit
    def encode_u8_int8(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=qcfg.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, qcfg)

    best_bf16_batch = max(results, key=results.get)
    int8_results = sweep(qparams, encode_u8_int8, (best_bf16_batch,))
    detail[f"serving_fast_batch_{best_bf16_batch}"] = round(
        int8_results[best_bf16_batch], 2)

    best = max(max(results.values()), max(int8_results.values()))
    variant = ("w8a8+flash+tanh" if max(int8_results.values())
               > max(results.values()) else "bf16")
    if decode_tps is not None:
        detail["decode_8b_int8_tokens_per_sec"] = round(decode_tps, 2)
    out = {
        "metric": f"images/sec/chip (SEED-2 tokenizer encode, {variant}, "
                  "224x224)",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / 5000.0, 4),
        "detail": detail,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
