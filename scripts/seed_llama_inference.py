#!/usr/bin/env python
"""Interleaved generation — the three canonical tasks of the reference
(scripts/seed_llama_inference_8B.py:94-120): visual question answering,
text-to-image, multimodal-prompt image generation.

  python scripts/seed_llama_inference.py --model 8b \
      --llm-ckpt ckpts/seed-llama-8b --tokenizer-ckpt ckpts/tokenizer \
      --text-tokenizer ckpts/llama_tokenizer --image images/cat.jpg
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
    ap.add_argument("--text-tokenizer", default=None,
                    help="HF LlamaTokenizer path (sentencepiece)")
    ap.add_argument("--image", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--top-p", type=float, default=0.5)
    ap.add_argument("--temperature", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seed_tpu.models import SEED_TOKENIZER, init_seed_tokenizer
    from seed_tpu.models import llama as M
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.serving import (ByteTextTokenizer, GenerationConfig,
                                  HFTextTokenizer, LlamaEngine,
                                  SeedLlamaInterface)
    from seed_tpu.utils.checkpoint import restore_checkpoint

    cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B,
           "tiny": M.LlamaConfig(vocab_size=40194, dim=256, layers=2, heads=4,
                                 kv_heads=4, ffn_dim=512, max_seq_len=1024)}[args.model]
    llm = (restore_checkpoint(args.llm_ckpt) if args.llm_ckpt
           else M.init_llama(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    tok_params = (restore_checkpoint(args.tokenizer_ckpt) if args.tokenizer_ckpt
                  else init_seed_tokenizer(jax.random.PRNGKey(1),
                                           SEED_TOKENIZER, jnp.bfloat16))
    text_tok = (HFTextTokenizer(args.text_tokenizer) if args.text_tokenizer
                else ByteTextTokenizer())

    engine = LlamaEngine(llm, cfg)
    iface = SeedLlamaInterface(engine, tok_params, SEED_TOKENIZER, text_tok)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           top_p=args.top_p, temperature=args.temperature,
                           do_sample=True, eos_token_id=text_tok.eos_token_id)

    def show(segs):
        for s in segs:
            if s.kind == "text":
                print("TEXT:", s.text)
            else:
                print("IMAGE codes:", s.image_codes[0][:8], "...",
                      "embedding" if s.image_embedding is not None else "")

    img_codes = None
    if args.image:
        from PIL import Image
        raw = jnp.asarray(np.asarray(
            Image.open(args.image).convert("RGB"), np.uint8))[None]
        img_codes = iface.encode_image(preprocess(raw, 224, jnp.bfloat16))[0]
        print("image codes:", img_codes.tolist())

    if img_codes is not None:
        print("== visual question answering ==")
        show(iface.generate([img_codes, "What is this animal?"], gen))

    print("== text-to-image generation ==")
    show(iface.generate(["Can you generate an image of a dog on the green grass?"],
                        gen, force_image=True))

    if img_codes is not None:
        print("== multimodal prompt image generation ==")
        show(iface.generate([img_codes, "Can you make the cat wear sunglasses?"],
                            gen, force_image=True))


if __name__ == "__main__":
    main()
