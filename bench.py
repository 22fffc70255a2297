#!/usr/bin/env python
"""Headline benchmark: SEED-2 tokenizer encode throughput (images/sec/chip).

Runs the full-scale encode graph (device-side preprocess + EVA-ViT-g 39
blocks + causal Q-Former + VQ argmin over 8192 codes -> 32 ids) on one
chip and prints ONE JSON line. Two named paths, reported separately:

- ``exact_img_s``: bf16, bit-exact w.r.t. the torch-parity bar (the
  BASELINE.md acceptance criterion) — swept over batch sizes.
- ``fast_img_s``: the serving path (W8A8 int8 ViT + Pallas short-seq
  attention + tanh GELU), also swept; ``fast_agreement`` is its measured
  token-id agreement vs the exact path on the same inputs (it is a lossy
  path; the headline value comes from it only with that caveat attached).

The 8B decode metric runs in its OWN subprocess (``--decode-only``) so the
encode allocations never sit next to the 8B weights (the round-2 in-situ
run was 15% below clean-chip for exactly that reason).

``vs_baseline`` is measured against the BASELINE.json aspiration of 5,000
images/sec/chip. (The reference repo publishes no tokenizer throughput —
see BASELINE.md; the v5e bf16 roofline for EVA-ViT-g at 224^2 is ~520
GFLOPs/image -> ~380 img/s at 100%% MFU, so the 5k figure is not
physically reachable in bf16; we report honestly against it.)
"""
import functools
import json
import os
import subprocess
import sys
import time

import jax

# persistent compile cache: the axon tunnel recompiles are minutes-long
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench_decode_8b():
    """Secondary metric: SEED-LLaMA-8B decode tokens/sec/chip.

    Full 8B decoder, int8 weights (the reference's 8-bit serving mode,
    epilogue dequant) with the fused ring KV cache, B=32 S=192 — the
    in-graph multi-token serving loop. Returns tokens/sec or None."""
    try:
        from seed_tpu.models import llama as M
        from seed_tpu.ops.quantization import quantize_tree

        cfg = M.SEED_LLAMA_8B
        # 8B bf16 (16GB) exceeds one v5e's HBM: build int8 weights host-side
        # (throughput doesn't depend on values — cheap numpy fill instead of
        # a 6.7B-sample PRNG) and ship ~7GB to the chip.
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
        # inside ONE compiled program (matches LlamaEngine.generate). The
        # cache's logical [L,S,H,B,2D] order equals XLA's preferred physical
        # order at decode shapes (round-3 layout change), so loop entry
        # needs no relayout copies.
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
        # Warmup x3: the first invocation of a freshly-(cache-)compiled
        # program through the axon tunnel reads 5-10x slow (PERF.md round 3
        # methodology note; this is what made BENCH_r03 record 91 tok/s
        # where the reproduced steady-state is ~930). Then time >=3 loop
        # invocations and report the MEDIAN, printing per-iteration times
        # so a residual cold read is visible in the tail.
        for _ in range(3):
            toks, _, cache, key = loop(params, tok, cache, key)
            np.asarray(toks[:, -1])                          # sync
            tok = toks[:, -1]
        iters = []
        for _ in range(3):
            t0 = time.perf_counter()
            toks, _, cache, key = loop(params, tok, cache, key)
            np.asarray(toks[:, -1])                          # sync point
            iters.append(time.perf_counter() - t0)
            tok = toks[:, -1]
        print(f"# decode per-iteration tok/s: "
              f"{[round(B * steps / t, 1) for t in iters]}", flush=True)
        dt = sorted(iters)[len(iters) // 2]
        return B * steps / dt
    except Exception as e:  # OOM / compile limits: report encode only
        import traceback
        print(f"# decode bench skipped: {type(e).__name__}: {e}",
              flush=True)
        traceback.print_exc()
        return None


def _decode_subprocess():
    """Run bench_decode_8b in a fresh process (clean allocator, clean
    chip) and parse its one-line JSON result."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--decode-only"],
            capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line).get("decode_tok_s")
        print(f"# decode subprocess gave no JSON: {out.stdout[-500:]} "
              f"{out.stderr[-500:]}", flush=True)
    except Exception as e:
        print(f"# decode subprocess failed: {e}", flush=True)
    return None


def main():
    from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
    from seed_tpu.ops.preprocess import preprocess

    # decode first, in its OWN process: the 8B weights + cache need the
    # chip to themselves, and encode must not inherit its allocator state
    decode_tps = _decode_subprocess()

    cfg = SEED_TOKENIZER
    params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.device_put(params)

    # Exact path: op-faithful math (fp32 softmax/LN/VQ distances, erf
    # GELU, no quantization) with attention in the Pallas kernel's
    # op-faithful branch — measured CLOSER to the fp32 ground truth than
    # the XLA scores-in-HBM path (0.9731 vs 0.9709 on the degenerate
    # random-init codebook whose top-2 VQ margins are ~5e-6) and 1.25x
    # faster (scripts/probe_exact_attn.py, PERF.md round 4). The fp32
    # torch-parity oracle tests keep the plain XLA path.
    import dataclasses
    ecfg = dataclasses.replace(cfg, vit=dataclasses.replace(
        cfg.vit, use_flash=True, flash_exact=True))

    @jax.jit
    def encode_u8(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=ecfg.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, ecfg)

    def sweep(p, fn, batches):
        """Per-iteration host sync: every iteration transfers its (tiny)
        ids to host before the next starts, so tunnel dispatch pipelining
        cannot skew the per-batch comparison (the round-2 'inverted batch
        curve' was an artifact of only syncing the last of 5 iters)."""
        res = {}
        for batch in batches:
            raw = np.random.RandomState(0).randint(
                0, 256, size=(batch, 224, 224, 3)).astype(np.uint8)
            raw = jnp.asarray(raw)
            # compile + 2 warmups (first post-compile invocation reads slow
            # through the tunnel — see the decode methodology note)
            np.asarray(fn(p, raw))
            np.asarray(fn(p, raw))
            # NOTE: device->host transfer is the sync point; on the axon
            # tunnel block_until_ready() returns before execution completes.
            n_iters = 5
            t0 = time.perf_counter()
            for _ in range(n_iters):
                np.asarray(fn(p, raw))
            dt = (time.perf_counter() - t0) / n_iters
            res[batch] = batch / dt
        return res

    batches = (16, 32, 64, 128)
    exact = sweep(params, encode_u8, batches)

    # Serving-fast variant: W8A8 int8 matmuls (the reference's 8-bit
    # serving mode) + Pallas short-seq attention + tanh GELU — lossy;
    # agreement measured below and carried in the JSON.
    from seed_tpu.models.seed_tokenizer import (quantize_for_serving,
                                                serving_fast_config)
    qparams, qcfg = quantize_for_serving(params, cfg)
    qcfg = serving_fast_config(qcfg)
    qparams = jax.device_put(qparams)

    @jax.jit
    def encode_u8_fast(p, raw_u8):
        imgs = preprocess(raw_u8, image_size=qcfg.vit.image_size,
                          dtype=jnp.bfloat16)
        return encode(p, imgs, qcfg)

    fast = sweep(qparams, encode_u8_fast, batches)

    # token-id agreement of the fast path vs the exact path, same inputs.
    # Agreement is a per-batch random variable (flips sit on VQ near-ties
    # of the random-init codebook — scripts/probe_exact_attn.py margin
    # analysis), so average over 4 disjoint batches and carry the spread:
    # single-batch sampling is what made r02's 0.9639 vs r03's 0.9497
    # look like a drift.
    per_batch = []
    for seed in (7, 8, 9, 10):
        raw = jnp.asarray(np.random.RandomState(seed).randint(
            0, 256, size=(64, 224, 224, 3)).astype(np.uint8))
        ids_exact = np.asarray(encode_u8(params, raw))
        ids_fast = np.asarray(encode_u8_fast(qparams, raw))
        per_batch.append(float((ids_exact == ids_fast).mean()))
    agreement = float(np.mean(per_batch))
    agreement_std = float(np.std(per_batch))

    best_exact = max(exact.values())
    best_fast = max(fast.values())
    detail = {
        "exact_img_s": {f"batch_{k}": round(v, 2) for k, v in exact.items()},
        "fast_img_s": {f"batch_{k}": round(v, 2) for k, v in fast.items()},
        "fast_agreement": round(agreement, 4),
        "fast_agreement_std": round(agreement_std, 4),
        "exact_best": round(best_exact, 2),
        "note": "exact path = op-faithful math (fp32 softmax/LN/VQ, erf "
                "GELU) with the Pallas op-faithful attention branch, "
                "measured closer to fp32 truth than the XLA path (0.9731 "
                "vs 0.9709) and 1.25x faster; torch parity is test-anchored "
                "on the XLA path in fp32. fast path is W8A8+flash+tanh "
                "with the stated token-id agreement",
        "methodology": "per-iteration host sync since r03 (r02 synced only "
                       "the last of 5 iters, inflating r02 by ~10-15%); "
                       "decode: 3 warmup loop invocations then median of 3 "
                       "timed (r03's single-warmup read a 10x-slow cold "
                       "first invocation)",
        # earned numbers from PERF.md probe scripts, carried so the driver
        # record holds them (round + script cited; not re-measured here):
        "reference_measurements": {
            "stage1_train_img_s": {"value": 117.2, "note":
                "B=32 joint ITC+ITM+LM fwd+bwd 273 ms/step, r02, "
                "scripts/bench_stage1_step.py"},
            "stage2_train_img_s": {"value": 139.1, "note":
                "B=32 precomputed-distill-target step 228 ms, r03, "
                "scripts/bench_stage2_step.py"},
            "e2e_8b_offload_demo": {"encode_s": 0.033, "gen_tok_s": 65.1,
                                    "diffusion_s": 71.4, "note":
                "warm-phase compute, one-chip host-offload, r03, "
                "scripts/demo_8b_offload.py (swaps tunnel-bound: PERF.md)"},
            "served_tok_s": {"value": 417.1, "req_per_min": 406.9,
                "ttft_ms_p50": 1756, "e2e_ms_p95": 9436, "note":
                "8B int8 continuous batcher, slots=64 decode_chunk=16 fp8 "
                "slot cache, 64 mixed-length requests (sampling t=1.0 "
                "top_p=0.5), r05 (chunk-budget fix + fp8 cache: was 318.7 "
                "r04; bf16 slots=16 = 359.7), scripts/bench_serving.py; "
                "full sweep + latency table in PERF.md round 5"},
        },
    }
    if decode_tps is not None:
        detail["decode_tok_s"] = round(decode_tps, 2)
    out = {
        "metric": "images/sec/chip (SEED-2 tokenizer encode, serving-fast "
                  "W8A8+flash+tanh, 224x224)",
        "value": round(best_fast, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(best_fast / 5000.0, 4),
        "detail": detail,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--decode-only" in sys.argv:
        tps = bench_decode_8b()
        print(json.dumps({"decode_tok_s": None if tps is None
                          else round(tps, 2)}))
    else:
        main()
