#!/usr/bin/env python
"""Training-length flash attention: LLaMA forward+backward with the Pallas
flash kernel vs the XLA einsum path at S=1024/2048.

VERDICT r1 weak #5: the kernel had "not demonstrated a win" — it was only
ever timed at S=512 decode-ish shapes. The reference trains at 1024-2048
(MultiModalLLM configs); at those lengths the XLA path materializes the
fp32 [B, H, S, S] score tensor (S=2048: 537 MB/head-batch-block fp32).

Model: 7B-geometry truncated to fit one v5e alongside activations
(L=8 layers is enough — attention cost scales linearly in L).
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

from seed_tpu.models import llama as M


def step_time(cfg, B, S, use_flash, iters=8):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = M.init_llama(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    params = jax.device_put(params, jax.devices()[0])
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.vocab_size, (B, S)), jnp.int32)

    def loss_fn(p):
        logits = M.forward(p, ids, cfg, remat=True, use_flash=use_flash)
        tgt = jnp.roll(ids, -1, axis=1)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    grad_fn = jax.jit(jax.grad(loss_fn))
    g = grad_fn(params)
    np.asarray(jax.tree.leaves(g)[0].ravel()[0])       # sync
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        g = grad_fn(params)
    g = grad_fn(params)
    np.asarray(jax.tree.leaves(g)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    del params, g
    return dt * 1e3


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    # vocab shrunk to keep the fp32 logits + softmax out of the picture
    # (we are timing ATTENTION); remat bounds bwd activation memory
    base = dataclasses.replace(
        M.SEED_LLAMA_8B, layers=8, vocab_size=2048)
    B = 4
    for S in (1024, 2048):
        for use_flash in (False, True):
            try:
                ms = step_time(base, B, S, use_flash)
                tokps = B * S / (ms / 1e3)
                print(f"S={S} flash={int(use_flash)}: {ms:7.1f} ms/step "
                      f"({tokps:,.0f} tok/s fwd+bwd, L=8)", flush=True)
            except Exception as e:
                print(f"S={S} flash={int(use_flash)}: failed "
                      f"{type(e).__name__}: {e}", flush=True)
