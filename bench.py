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
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
    from seed_tpu.ops.preprocess import preprocess

    cfg = SEED_TOKENIZER
    params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.device_put(params)

    @functools.partial(jax.jit, static_argnums=())
    def encode_u8(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=cfg.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, cfg)

    results = {}
    for batch in (16, 32, 64, 128):
        raw = np.random.RandomState(0).randint(
            0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
        raw = jnp.asarray(raw)
        np.asarray(encode_u8(params, raw))  # compile + warmup
        # NOTE: device->host transfer is the sync point; on the axon tunnel
        # block_until_ready() returns before execution completes.
        n_iters = 5
        t0 = time.perf_counter()
        for _ in range(n_iters - 1):
            encode_u8(params, raw)
        np.asarray(encode_u8(params, raw))
        dt = (time.perf_counter() - t0) / n_iters
        results[batch] = batch / dt

    best = max(results.values())
    out = {
        "metric": "images/sec/chip (SEED-2 tokenizer encode, bf16, 224x224)",
        "value": round(best, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / 5000.0, 4),
        "detail": {f"batch_{k}": round(v, 2) for k, v in results.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
