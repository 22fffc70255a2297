#!/usr/bin/env python
"""Merge a LoRA adapter into the base LLaMA weights and save.

Rebuild of MultiModalLLM/src/tools/merge_lora_weights.py:27-45
(merge_and_unload -> save_pretrained).

  python scripts/merge_lora.py --base ckpts/llm --lora ckpts/lora \
      --output ckpts/llm_merged
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="native llama checkpoint")
    ap.add_argument("--lora", required=True,
                    help="native lora checkpoint (or use convert_checkpoints "
                         "lora first for PEFT .bin files)")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from seed_tpu.train.lora import merge_lora_weights
    from seed_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    base = restore_checkpoint(args.base)
    # a train_llm.py checkpoint stores {"base":..., "lora":...}; a bare tree
    # plus separate lora also works
    if isinstance(base, dict) and set(base) == {"base", "lora"}:
        lora = base["lora"]
        base = base["base"]
    else:
        lora = restore_checkpoint(args.lora)
    merged = merge_lora_weights(base, lora)
    save_checkpoint(args.output, merged)
    print(f"merged -> {args.output}")


if __name__ == "__main__":
    main()
