#!/usr/bin/env python
"""Fast-vs-exact token agreement on a TRAINED codebook (VERDICT r04 #3).

The round-4 analysis showed the ~0.95 encode-variant agreement numbers
are noise-dominated BY CONSTRUCTION on a random-init codebook: uniform
(-1/8192, 1/8192) init puts all 8192 codes within ~2.4e-4 of the origin
(median top-2 relative VQ margin 5e-6), so any ulp of reduction-order
noise flips argmins. The prediction — "a trained codebook separates
codes by orders of magnitude more, so the fast path agrees" — was
argued, not measured. This measures it:

1. run stage-2 training (full-scale frozen towers, trainable VQ/MLPs/
   recon, the real masked-adamw optimizer) on-chip until codebook usage
   and top-2 margins stabilize;
2. re-run the encode-variants agreement table (bf16-exact reference vs
   flash / flash_exact / w8a8+flash+tanh serving-fast) on the trained
   weights, same eval corpus distribution as training;
3. report the margin trajectory + final agreement.

    PYTHONPATH=/root/repo python scripts/probe_trained_codebook.py \
        [--steps 400] [--batch 32]
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
import optax

from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
from seed_tpu.models.seed_tokenizer import quantize_for_serving
from seed_tpu.ops.preprocess import preprocess
from seed_tpu.train.optim import adamw, masked_trainable
from seed_tpu.train.tokenizer_training import (STAGE2_TRAINABLE,
                                               Stage2Config,
                                               stage2_loss)


def margin_stats(params, cfg, raw_u8):
    """Median/quantile relative top-2 VQ margin over a probe batch: the
    quantity that decides bf16-path index stability (probe_exact_attn)."""
    @jax.jit
    def f(p, raw):
        imgs = preprocess(raw, image_size=cfg.vit.image_size,
                          dtype=jnp.bfloat16)
        from seed_tpu.models.seed_tokenizer import encode_features
        z = encode_features(p, imgs, cfg)          # pre-VQ features
        cb = p["vq"]["codebook"].astype(jnp.float32)
        zf = z.astype(jnp.float32).reshape(-1, cb.shape[1])
        d = (jnp.sum(zf ** 2, 1, keepdims=True)
             - 2 * zf @ cb.T + jnp.sum(cb ** 2, 1))
        top2 = -jax.lax.top_k(-d, 2)[0]             # two smallest distances
        rel = (top2[:, 1] - top2[:, 0]) / jnp.maximum(
            jnp.abs(top2[:, 0]), 1e-12)
        return rel
    rel = np.asarray(f(params, raw_u8))
    return {"margin_p50": float(np.median(rel)),
            "margin_p10": float(np.percentile(rel, 10)),
            "frac_lt_1e3": float((rel < 1e-3).mean())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=64)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args()

    base = SEED_TOKENIZER
    tok_cfg = dataclasses.replace(base, with_recon_blocks=True,
                                  use_qformer_image=True)
    s2 = Stage2Config(tokenizer=tok_cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_seed_tokenizer(jax.random.PRNGKey(0), tok_cfg,
                                     dtype=jnp.bfloat16)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    opt = masked_trainable(
        adamw(lambda _: 1e-4, b1=0.9, b2=0.999, eps=1e-8,
              weight_decay=0.05, params=params),
        params, STAGE2_TRAINABLE)
    opt_state = jax.device_put(opt.init(params), dev)

    @jax.jit
    def train_step(p, st, batch, rng):
        (loss, metrics), g = jax.value_and_grad(
            lambda p: stage2_loss(p, batch, rng, s2), has_aux=True)(p)
        upd, st = opt.update(g, st, p)
        return optax.apply_updates(p, upd), st, loss, metrics

    # training corpus: 8 preprocessed-u8 batches, cycled (the SAME pixel
    # distribution the agreement eval uses)
    mk = lambda seed, n: jnp.asarray(np.random.RandomState(seed).randint(
        0, 256, (n, 224, 224, 3), dtype=np.uint8))
    train_raw = [mk(s, args.batch) for s in range(8)]
    train_batches = [
        {"images": preprocess(r, image_size=tok_cfg.vit.image_size,
                              dtype=jnp.bfloat16),
         "clip_embeds": jnp.asarray(
             np.random.RandomState(50 + i).randn(
                 args.batch, tok_cfg.image_embed_dim), jnp.float32)}
        for i, r in enumerate(train_raw)]
    probe_raw = mk(99, args.batch)

    print("probe init " + json.dumps(margin_stats(params, tok_cfg,
                                                  probe_raw)), flush=True)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, metrics = train_step(
            params, opt_state, train_batches[step % len(train_batches)], sub)
        if step % args.log_every == 0 or step == 1:
            l = float(np.asarray(loss))
            m = margin_stats(params, tok_cfg, probe_raw)
            m.update(step=step, loss=round(l, 4),
                     usage=round(float(np.asarray(
                         metrics["codebook_usage"])), 4),
                     wall_s=round(time.perf_counter() - t0, 1))
            print("probe " + json.dumps(m), flush=True)

    # agreement table on the trained weights
    with jax.default_device(cpu):
        params_host = jax.device_get(params)
        qparams, qcfg = quantize_for_serving(
            jax.tree.map(jnp.asarray, params_host), tok_cfg)
    qparams = jax.device_put(qparams, dev)

    vit = lambda c, **kw: dataclasses.replace(
        c, vit=dataclasses.replace(c.vit, **kw))
    variants = [
        ("bf16_exact", params, tok_cfg),
        ("flash", params, vit(tok_cfg, use_flash=True)),
        ("flash_exact", params, vit(tok_cfg, use_flash=True,
                                    flash_exact=True)),
        ("w8a8_flash_tanh", qparams,
         vit(qcfg, use_flash=True, act="gelu_tanh")),
    ]
    corpus = [mk(200 + b, args.eval_batch) for b in range(args.eval_batches)]
    ref_ids = None
    out = {}
    for tag, p, c in variants:
        @jax.jit
        def f(p, raw, c=c):
            imgs = preprocess(raw, image_size=c.vit.image_size,
                              dtype=jnp.bfloat16)
            return encode(p, imgs, c)
        ids = [np.asarray(f(p, raw)) for raw in corpus]
        if ref_ids is None:
            ref_ids = ids
        agree = np.asarray([(a == r).mean() for a, r in zip(ids, ref_ids)])
        out[tag] = {"agreement_mean": round(float(agree.mean()), 4),
                    "agreement_std": round(float(agree.std()), 4),
                    "agreement_min": round(float(agree.min()), 4)}
        print(f"# trained {tag:16s} agree {agree.mean():.4f} "
              f"+/- {agree.std():.4f} (min {agree.min():.4f})", flush=True)
    print("trained_agreement " + json.dumps(
        {"steps": args.steps, "batch": args.batch, "frontier": out}))


if __name__ == "__main__":
    main()
