#!/usr/bin/env python
"""Full-scale stage-2 tokenizer-training step throughput on one chip.

Stage 2 (SEED_Tokenizer qformer_quantizer semantics): frozen EVA-ViT-g +
Q-Former towers, trainable VQ codebook + encode/decode MLPs + recon
blocks + Reverse Q-Former distill head, losses 5/2/0.5 — fwd+bwd.

Two timings:
  - `precomputed targets`: batch carries CLIP-ViT-H distill embeds (the
    --emit-clip-embeds production path).
  - `inline CLIP tower`: adds the frozen CLIP-ViT-H forward per batch
    (reference blip2_qformer_codebook_all_image.py:283-286 clip_model(image)).

    python scripts/bench_stage2_step.py
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

from seed_tpu.models import SEED_TOKENIZER, init_seed_tokenizer
from seed_tpu.models.vit import (CLIP_VIT_H, clip_image_embed,
                                 init_clip_vision_projection, init_vit)
from seed_tpu.train.tokenizer_training import Stage2Config, stage2_loss

B = 32


def main():
    base = SEED_TOKENIZER
    tok_cfg = dataclasses.replace(base, with_recon_blocks=True,
                                  use_qformer_image=True)
    s2 = Stage2Config(tokenizer=tok_cfg)
    key = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_seed_tokenizer(key, tok_cfg, dtype=jnp.bfloat16)
        clip_params = {
            "vit": init_vit(jax.random.fold_in(key, 2), CLIP_VIT_H,
                            jnp.bfloat16),
            "head": init_clip_vision_projection(
                jax.random.fold_in(key, 3), CLIP_VIT_H,
                tok_cfg.image_embed_dim, jnp.bfloat16)}
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    clip_params = jax.device_put(clip_params, dev)
    gb = lambda p: sum(x.nbytes for x in jax.tree.leaves(p)) / 2**30
    print(f"device: {dev}  B={B}  tokenizer {gb(params):.2f}G "
          f"clip-H {gb(clip_params):.2f}G", flush=True)

    npr = np.random.RandomState(0)
    images = jnp.asarray(npr.randn(B, 224, 224, 3), jnp.bfloat16)
    clip_embeds = jnp.asarray(npr.randn(B, tok_cfg.image_embed_dim),
                              jnp.float32)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def grad_step(p, batch, rng):
        return jax.grad(lambda p: stage2_loss(p, batch, rng, s2)[0])(p)

    @jax.jit
    def grad_step_inline(p, cp, images, rng):
        targets = clip_image_embed(cp["vit"], cp["head"], images,
                                   CLIP_VIT_H).astype(jnp.float32)
        batch = {"images": images, "clip_embeds": targets}
        return jax.grad(lambda p: stage2_loss(p, batch, rng, s2)[0])(p)

    def time_it(fn, *args, iters=6):
        g = fn(*args)
        np.asarray(jax.tree.leaves(g)[0].ravel()[0])  # sync (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            g = fn(*args)
        g = fn(*args)
        np.asarray(jax.tree.leaves(g)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters * 1e3

    batch = {"images": images, "clip_embeds": clip_embeds}
    ms = time_it(grad_step, params, batch, rng)
    print(f"stage2 precomputed targets: {ms:7.1f} ms/step "
          f"({B/(ms/1e3):.1f} img/s fwd+bwd)", flush=True)
    ms = time_it(grad_step_inline, params, clip_params, images, rng)
    print(f"stage2 inline CLIP tower:   {ms:7.1f} ms/step "
          f"({B/(ms/1e3):.1f} img/s fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
