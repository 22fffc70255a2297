#!/usr/bin/env python
"""Launch the SEED-LLaMA HTTP service (+ optional diffusion de-tokenizer).

  python scripts/serve.py --model 8b --llm-ckpt ... --tokenizer-ckpt ... \
      --diffusion-ckpt ... --port 7890
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["8b", "14b", "tiny"], default="tiny")
    ap.add_argument("--llm-ckpt", default=None)
    ap.add_argument("--tokenizer-ckpt", default=None)
    ap.add_argument("--diffusion-ckpt", default=None)
    ap.add_argument("--text-tokenizer", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=7890)
    ap.add_argument("--keep-ratio", action="store_true",
                    help="Resize(short side)+CenterCrop instead of square "
                         "resize (models/transforms.py get_transform "
                         "keep_ratio branch; the shipped demo config uses "
                         "keep_ratio=False)")
    ap.add_argument("--offload", action="store_true",
                    help="pin tokenizer + diffusion params on host CPU and "
                         "swap them into HBM per call (fits the 8B demo on "
                         "one 16GB chip; seed_llama_flask.py:53-84 semantics)")
    ap.add_argument("--scheduler", action="store_true",
                    help="serve the LLM through the continuous-batching "
                         "scheduler: concurrent requests share decode "
                         "dispatches (slots/decode-chunk below) instead of "
                         "serializing whole generate calls")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--decode-chunk", type=int, default=8)
    ap.add_argument("--slot-cache", choices=("bf16", "fp8"), default="bf16",
                    help="slot KV cache dtype: fp8 (e4m3) halves cache HBM "
                         "— 64 slots fit beside the 8B int8 weights on one "
                         "16GB chip (417 tok/s vs 360 at bf16 slots=16, "
                         "PERF.md round 5)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seed_tpu.models import SEED_TOKENIZER, init_seed_tokenizer
    from seed_tpu.models import llama as M
    from seed_tpu.serving import (ByteTextTokenizer, HFTextTokenizer,
                                  LlamaEngine, SeedLlamaInterface)
    from seed_tpu.serving.server import GenerateService, serve
    from seed_tpu.utils.checkpoint import restore_checkpoint

    cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B,
           "tiny": M.LlamaConfig(vocab_size=40194, dim=256, layers=2, heads=4,
                                 kv_heads=4, ffn_dim=512, max_seq_len=1024)}[args.model]
    llm = (restore_checkpoint(args.llm_ckpt) if args.llm_ckpt
           else M.init_llama(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    tok_params = (restore_checkpoint(args.tokenizer_ckpt)
                  if args.tokenizer_ckpt
                  else init_seed_tokenizer(jax.random.PRNGKey(1),
                                           SEED_TOKENIZER, jnp.bfloat16))
    diffusion = None
    if args.diffusion_ckpt:
        from seed_tpu.models.unclip import SD21_UNCLIP, UnCLIPDecoder
        diffusion = UnCLIPDecoder(restore_checkpoint(args.diffusion_ckpt),
                                  SD21_UNCLIP, offload=args.offload)
    text_tok = (HFTextTokenizer(args.text_tokenizer) if args.text_tokenizer
                else ByteTextTokenizer())

    if args.scheduler:
        from seed_tpu.serving import ScheduledEngine
        engine = ScheduledEngine(llm, cfg, slots=args.slots,
                                 decode_chunk=args.decode_chunk,
                                 cache_dtype={"bf16": jnp.bfloat16,
                                              "fp8": jnp.float8_e4m3fn
                                              }[args.slot_cache])
    else:
        engine = LlamaEngine(llm, cfg)
    iface = SeedLlamaInterface(engine, tok_params,
                               SEED_TOKENIZER, text_tok, diffusion=diffusion,
                               offload=args.offload)
    serve(GenerateService(iface, keep_ratio=args.keep_ratio),
          host=args.host, port=args.port)


if __name__ == "__main__":
    main()
