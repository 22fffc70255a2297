#!/usr/bin/env python
"""Multimodal serving under offload + continuous batching, measured.

Composes the two headline serving mechanisms on ONE chip (VERDICT r03
weak #5): the visual tokenizer swaps into HBM only for encode
(serving/offload.py — the reference's offload trick,
gradio_demo/seed_llama_flask.py:125-130), while the resident 8B int8 LLM
serves N concurrent multimodal requests through ``ScheduledEngine`` so
their decode steps share dispatches (the reference serves one request at
a time, seed_llama_flask.py:172).

Workload: N requests, each "describe <img>[32 codes]</img>" -> 64
sampled tokens (t=1.0 top_p=0.5, reference defaults, eos off so token
counts are comparable). Images are batch-encoded under ONE tokenizer
acquire (re-entrant refcount: one swap, not N). Weights are synthetic —
the cost under test is orchestration + full-scale graphs, as in
demo_8b_offload.py.

    python scripts/bench_serving_offload.py [--requests 16] [--tiny]
"""
import argparse
import functools
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from demo_8b_offload import synth_params


def run_wave(iface, codes, gen, n, seed0):
    """n concurrent callers -> shared slot pool. eos is disabled, so each
    request generates exactly gen.max_new_tokens tokens; segments are
    still split (exercises the full multimodal return path)."""
    done = [None] * n
    errs = []

    def worker(i):
        try:
            done[i] = iface.generate(["describe ", codes[i % len(codes)]],
                                     gen=gen, seed=seed0 + i)
        except Exception as e:  # surface, don't hang the join
            errs.append(repr(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise RuntimeError(errs[0])
    assert all(s is not None for s in done)
    return n * gen.max_new_tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=320)
    ap.add_argument("--slot-cache", choices=("bf16", "fp8"), default="bf16",
                    help="slot KV cache dtype (fp8 halves cache HBM; "
                    "PERF.md round 5)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs (CPU smoke test)")
    args = ap.parse_args()

    from seed_tpu.models import (SEED_TOKENIZER, TINY_TOKENIZER,
                                 init_seed_tokenizer)
    from seed_tpu.models import llama as M
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.ops.quantization import quantize_tree
    from seed_tpu.serving import (ByteTextTokenizer, GenerationConfig,
                                  SeedLlamaInterface)
    from seed_tpu.serving.scheduler import ScheduledEngine

    dev = jax.devices()[0]
    t = {"device": str(dev)}

    cfg = (M.LlamaConfig(vocab_size=40194, dim=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, max_seq_len=512)
           if args.tiny else M.SEED_LLAMA_8B)
    tok_cfg = TINY_TOKENIZER if args.tiny else SEED_TOKENIZER
    img_size = tok_cfg.vit.image_size

    llm_params = synth_params(
        lambda k: quantize_tree(M.init_llama(k, cfg, jnp.bfloat16)))
    tok_params = synth_params(
        lambda k: init_seed_tokenizer(k, tok_cfg, jnp.bfloat16))
    llm_params = jax.device_put(llm_params, dev)
    jax.block_until_ready(llm_params)

    cache_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn}[
        args.slot_cache]
    engine = ScheduledEngine(llm_params, cfg, slots=args.slots,
                             max_len=args.max_len, decode_chunk=args.chunk,
                             cache_dtype=cache_dtype)
    iface = SeedLlamaInterface(engine, tok_params, tok_cfg,
                               ByteTextTokenizer(), offload=True)
    gen = GenerationConfig(max_new_tokens=args.new_tokens, do_sample=True,
                           temperature=1.0, top_p=0.5, eos_token_id=-1)

    try:
        # ---- batched encode under ONE tokenizer acquire ----
        raw = np.random.RandomState(0).randint(
            0, 256, size=(args.requests, img_size, img_size, 3)
        ).astype(np.uint8)
        prep = jax.jit(functools.partial(preprocess, image_size=img_size,
                                         dtype=jnp.bfloat16))
        imgs = prep(jnp.asarray(raw))
        iface.encode_image(imgs)              # warmup: compile + first swap
        t0 = time.perf_counter()
        codes = iface.encode_image(imgs)      # timed: swap-in+encode+swap-out
        t["encode_total_s"] = round(time.perf_counter() - t0, 3)
        t["tok_swaps"] = iface._tok.swap_count

        # ---- warmup wave: compile prefill buckets + decode program ----
        run_wave(iface, codes, gen, min(4, args.requests), seed0=1000)

        # ---- timed wave ----
        t0 = time.perf_counter()
        total = run_wave(iface, codes, gen, args.requests, seed0=0)
        wall = time.perf_counter() - t0
        t.update(requests=args.requests, slots=args.slots,
                 chunk=args.chunk, slot_cache=args.slot_cache,
                 gen_tok=total, wall_s=round(wall, 2),
                 served_tok_s=round(total / wall, 1),
                 req_per_min=round(args.requests / wall * 60, 1))
        print(json.dumps(t))
    finally:
        engine.close()


if __name__ == "__main__":
    main()
