#!/usr/bin/env python
"""The full SEED-LLaMA-8B multimodal demo as ONE system on ONE chip.

BASELINE target #3 / the reference's headline serving capability: encode
an image to 32 VQ codes, generate interleaved text+image tokens with the
8B LLM, and decode the generated image back — all on a single 16GB
device, via dynamic host<->HBM offload of the visual tokenizer and the
diffusion de-tokenizer (gradio_demo/seed_llama_flask.py:53-84 offload
flags, :125-130 encoder swap, :205-209 diffusion swap).

Memory script (v5e, 15.75GB usable):
  resident:  8B int8 weights (~6.8G) + KV cache B=1 S=512 (~0.27G)
  swapped:   SEED tokenizer bf16 (~2.6G)  OR  unCLIP bf16 (~2.2G)
  peak:      ~9.5G — never both swappable modules at once.

Weights are synthetic (no released checkpoints in this container) — the
capability under test is the orchestration: every phase runs the real
full-scale graph on the real chip, and the printed latency breakdown is
the real cost. Run:

    python scripts/demo_8b_offload.py [--steps 32] [--diffusion]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def synth_params(init_fn, quantize=False):
    """Host-side synthetic weights from eval_shape + cheap numpy fill
    (one CPU core: jax PRNG at billions of params is minutes; randint is
    seconds). Values don't affect cost — shapes and dtypes do."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)

        def fill(s):
            if s.dtype == jnp.int8:
                return jnp.asarray(rng.randint(-127, 128, size=s.shape,
                                               dtype=np.int8))
            # small nonzero values keep bf16 matmul outputs finite
            return jnp.asarray(np.full(s.shape, 0.01, np.float32), s.dtype)

        return jax.tree.map(fill, shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32,
                    help="max new tokens (34 = one full image segment)")
    ap.add_argument("--diffusion", action="store_true",
                    help="also run the 20-step unCLIP diffusion decode "
                         "(adds a large one-time compile)")
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs (CPU smoke test of the orchestration)")
    args = ap.parse_args()

    from seed_tpu.models import (SEED_TOKENIZER, TINY_TOKENIZER,
                                 init_seed_tokenizer)
    from seed_tpu.models import llama as M
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.ops.quantization import quantize_tree
    from seed_tpu.serving import (ByteTextTokenizer, GenerationConfig,
                                  LlamaEngine, SeedLlamaInterface)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    t = {}

    # ---- host-side builds (nothing on the chip yet) ----
    t0 = time.perf_counter()
    # tiny keeps the FULL multimodal vocabulary (image ids live at 32000+)
    cfg = (M.LlamaConfig(vocab_size=40194, dim=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, max_seq_len=512)
           if args.tiny else M.SEED_LLAMA_8B)
    tok_cfg = TINY_TOKENIZER if args.tiny else SEED_TOKENIZER
    img_size = tok_cfg.vit.image_size
    llm_params = synth_params(
        lambda k: quantize_tree(M.init_llama(k, cfg, jnp.bfloat16)))
    tok_params = synth_params(
        lambda k: init_seed_tokenizer(k, tok_cfg, jnp.bfloat16))
    t["build_host_s"] = time.perf_counter() - t0

    gb = lambda p: sum(x.nbytes for x in jax.tree.leaves(p)) / 2**30
    print(f"host: llm int8 {gb(llm_params):.2f}G, "
          f"tokenizer bf16 {gb(tok_params):.2f}G", flush=True)

    diffusion = None
    if args.diffusion:
        from seed_tpu.models.unclip import (SD21_UNCLIP, UnCLIPDecoder,
                                            init_unclip)
        diff_params = synth_params(
            lambda k: init_unclip(k, SD21_UNCLIP, jnp.bfloat16))
        print(f"host: unclip bf16 {gb(diff_params):.2f}G", flush=True)
        diffusion = UnCLIPDecoder(diff_params, SD21_UNCLIP, offload=True)

    # ---- 8B weights onto the chip (resident for the whole demo) ----
    t0 = time.perf_counter()
    llm_params = jax.device_put(llm_params, dev)
    jax.block_until_ready(llm_params)
    t["llm_to_hbm_s"] = time.perf_counter() - t0

    engine = LlamaEngine(llm_params, cfg, max_len=args.max_len,
                         chunk_steps=min(32, args.steps))
    iface = SeedLlamaInterface(engine, tok_params, tok_cfg,
                               ByteTextTokenizer(), diffusion=diffusion,
                               offload=True)

    # ---- phase 1: ENCODE (tokenizer swaps in, runs, swaps out) ----
    raw = np.random.RandomState(0).randint(
        0, 256, size=(1, img_size, img_size, 3)).astype(np.uint8)
    # jit the preprocess: eager ops are one tunnel round trip each
    prep = jax.jit(functools.partial(preprocess, image_size=img_size,
                                     dtype=jnp.bfloat16))
    img = prep(jnp.asarray(raw))

    t0 = time.perf_counter()
    codes = iface.encode_image(img)            # swap-in + encode + swap-out
    t["encode_total_s"] = time.perf_counter() - t0
    assert not iface._tok.resident, "tokenizer must leave the chip"
    print(f"encode (cold, incl. compile+swap): {t['encode_total_s']:.2f}s",
          flush=True)

    # warm encode: separate the swap from the compute
    t0 = time.perf_counter()
    p_dev = iface._tok.acquire()
    jax.block_until_ready(p_dev)
    t["encode_swap_in_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = np.asarray(iface._encode_image(p_dev, img))
    t["encode_compute_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    iface._tok.release()
    t["encode_swap_out_s"] = time.perf_counter() - t0
    print(f"encode warm: swap-in {t['encode_swap_in_s']:.2f}s  "
          f"compute {t['encode_compute_s']:.3f}s  "
          f"swap-out {t['encode_swap_out_s']:.3f}s", flush=True)

    # ---- phase 2: GENERATE with the resident 8B (image-in, image-out) ----
    gen = GenerationConfig(max_new_tokens=args.steps, temperature=1.0,
                           top_p=0.5, eos_token_id=2)
    t0 = time.perf_counter()
    segments = iface.generate(["a photo of ", codes[0]], gen=gen, seed=0,
                              force_image=True)
    t["generate_cold_s"] = time.perf_counter() - t0
    print(f"generate (cold, incl. prefill+loop compiles): "
          f"{t['generate_cold_s']:.2f}s", flush=True)

    t0 = time.perf_counter()
    segments = iface.generate(["a photo of ", codes[0]], gen=gen, seed=1,
                              force_image=True)
    t["generate_warm_s"] = time.perf_counter() - t0
    n_tok = sum(len(iface.text.encode(s.text)) if s.kind == "text"
                else 34 for s in segments)
    t["generate_tok_s"] = args.steps / t["generate_warm_s"]
    print(f"generate warm: {t['generate_warm_s']:.2f}s "
          f"({t['generate_tok_s']:.1f} tok/s at B=1)", flush=True)

    # ---- phase 3: DECODE the generated (or input) image codes ----
    # force_image + random weights can still emit malformed blocks; decode
    # the input codes if no image segment was generated
    img_segs = [s for s in segments if s.kind == "image"]
    dec_codes = (img_segs[0].image_codes if img_segs else codes)
    t0 = time.perf_counter()
    out = iface.decode_image(np.asarray(dec_codes).reshape(1, -1))
    t["decode_total_s"] = time.perf_counter() - t0
    kind = "pixels" if diffusion is not None else "unclip embedding"
    print(f"decode ({kind}) cold: {t['decode_total_s']:.2f}s "
          f"shape={np.asarray(out).shape}", flush=True)
    t0 = time.perf_counter()
    out = iface.decode_image(np.asarray(dec_codes).reshape(1, -1))
    t["decode_warm_s"] = time.perf_counter() - t0
    print(f"decode warm: {t['decode_warm_s']:.2f}s", flush=True)

    t["tok_swaps"] = iface._tok.swap_count
    result = {"demo": "8b_offload_e2e", "ok": True,
              "segments": [s.kind for s in segments],
              **{k: round(v, 3) for k, v in t.items()}}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
