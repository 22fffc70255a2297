#!/usr/bin/env python
"""Full-scale stage-1 tokenizer-training step throughput on one chip:
EVA-ViT-g (frozen) + causal Q-Former, joint ITC+ITM+LM loss, fwd+bwd,
with and without the Pallas short-seq ViT attention (--flash-vit default
in scripts/train_tokenizer.py).

    python scripts/bench_stage1_step.py
"""
import dataclasses
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

from seed_tpu.models import SEED_TOKENIZER, init_seed_tokenizer
from seed_tpu.train.tokenizer_training import (Stage1Config, init_itm_head,
                                               init_stage1_head,
                                               stage1_total_loss)
from seed_tpu.models.qformer import init_lm_head

B, T = 32, 32


def step_ms(use_flash, iters=6):
    base = SEED_TOKENIZER
    tok_cfg = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, use_flash=use_flash),
        qformer=dataclasses.replace(base.qformer, with_text=True))
    key = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tok_params = init_seed_tokenizer(key, tok_cfg, dtype=jnp.bfloat16)
    s1 = Stage1Config(tokenizer=tok_cfg)
    params = {
        "tokenizer": jax.device_put(tok_params, jax.devices()[0]),
        "head": init_stage1_head(jax.random.fold_in(key, 1), s1),
        "itm_head": init_itm_head(jax.random.fold_in(key, 3), s1),
        "lm_head": init_lm_head(jax.random.fold_in(key, 2), tok_cfg.qformer),
    }
    rng = jax.random.PRNGKey(1)
    npr = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(npr.randn(B, 224, 224, 3), jnp.bfloat16),
        "text_ids": jnp.asarray(npr.randint(0, 30000, (B, T)), jnp.int32),
        "text_pad": jnp.zeros((B, T), bool),
    }

    @jax.jit
    def grad_step(p, batch, rng):
        def scalar(p):
            return stage1_total_loss(p, batch, rng, s1)[0]
        return jax.grad(scalar)(p)

    g = grad_step(params, batch, rng)
    np.asarray(jax.tree.leaves(g)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        g = grad_step(params, batch, rng)
    g = grad_step(params, batch, rng)
    np.asarray(jax.tree.leaves(g)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    del params, g
    return dt * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  B={B}", flush=True)
    for use_flash in (False, True):
        try:
            ms = step_ms(use_flash)
            print(f"stage1 flash_vit={int(use_flash)}: {ms:7.1f} ms/step "
                  f"({B/(ms/1e3):.1f} img/s fwd+bwd)", flush=True)
        except Exception as e:
            print(f"stage1 flash_vit={int(use_flash)}: failed "
                  f"{type(e).__name__}: {e}", flush=True)
