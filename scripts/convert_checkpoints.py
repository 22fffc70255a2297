#!/usr/bin/env python
"""Convert released PyTorch checkpoints to the native sharded format.

Families (SURVEY.md §7): seed_quantizer.pt, HF LLaMA (vicuna/llama2),
PEFT LoRA adapters, diffusers stable-diffusion-2-1-unclip.

  python scripts/convert_checkpoints.py quantizer seed_quantizer.pt out/tokenizer
  python scripts/convert_checkpoints.py llama path/to/hf_dir out/llm --pad-vocab 40320
  python scripts/convert_checkpoints.py lora adapter_model.bin out/lora
  python scripts/convert_checkpoints.py unclip path/to/diffusers_dir out/unclip
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_dir_or_file(path):
    from seed_tpu.convert import load_torch_state_dict
    if os.path.isdir(path):
        sd = {}
        files = (glob.glob(os.path.join(path, "*.safetensors"))
                 or glob.glob(os.path.join(path, "*.bin"))
                 or glob.glob(os.path.join(path, "*.pt")))
        for f in sorted(files):
            sd.update(load_torch_state_dict(f))
        return sd
    return load_torch_state_dict(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["quantizer", "llama", "lora", "unclip"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--pad-vocab", type=int, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from seed_tpu.utils.checkpoint import save_checkpoint

    if args.family == "quantizer":
        from seed_tpu.convert import convert_quantizer
        tree = convert_quantizer(load_dir_or_file(args.src))
    elif args.family == "llama":
        from seed_tpu.convert import convert_llama
        from seed_tpu.models.llama import pad_vocab
        sd = load_dir_or_file(args.src)
        pv = args.pad_vocab or pad_vocab(sd.get(
            "model.embed_tokens.weight", sd.get("embed_tokens.weight")).shape[0])
        tree = convert_llama(sd, padded_vocab=pv)
    elif args.family == "lora":
        from seed_tpu.convert import convert_lora
        tree = convert_lora(load_dir_or_file(args.src))
    else:
        from seed_tpu.convert.unclip_convert import (convert_clip_text,
                                                     convert_image_normalizer,
                                                     convert_unet,
                                                     convert_vae_decoder)
        tree = {}
        for sub, fn in (("unet", convert_unet), ("vae", convert_vae_decoder),
                        ("text_encoder", convert_clip_text),
                        ("image_normalizer", convert_image_normalizer)):
            subdir = os.path.join(args.src, sub)
            if os.path.isdir(subdir):
                tree[sub] = fn(load_dir_or_file(subdir))
            else:
                print(f"warning: {subdir} missing, skipping {sub}")

    import jax
    tree = jax.tree.map(jnp.asarray, tree)
    save_checkpoint(args.dst, tree)
    print(f"converted {args.family}: {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
