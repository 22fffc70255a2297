#!/usr/bin/env python
"""SEED-LLaMA training entry (pretrain / SFT).

TPU rebuild of MultiModalLLM/src/train/train.py + trainer.py: LoRA (or
full) fine-tuning of LLaMA with the extended image-token vocabulary on
pre-tokenized pkl shards, FSDP(+TP) sharding, cosine-with-floor schedule,
grad accumulation, checkpoint/resume (ignore-data-skip semantics: streams
are resampled on resume, matching the reference launch scripts).

  python scripts/train_llm.py --data 'shards/*.tar' --mode pretrain \
      --steps 30000 --batch-size 128 --grad-accum 4 --lr 1.5e-4 \
      --output ckpts/llm
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--mode", choices=["pretrain", "sft"], default="pretrain")
    ap.add_argument("--model", choices=["8b", "14b", "small", "tiny"],
                    default="tiny")
    ap.add_argument("--llm-ckpt", default=None)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch-size", type=int, default=8, help="global batch")
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--max-length", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1.5e-4)
    ap.add_argument("--min-lr-ratio", type=float, default=0.05)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument("--lora", action="store_true", default=True)
    ap.add_argument("--no-lora", dest="lora", action="store_false")
    ap.add_argument("--learnable-embeddings-only", action="store_true",
                    help="restrict embed_tokens/lm_head updates to the new "
                         "image-token rows (peft_model.py:130-163 "
                         "get_learnable_image_embedding_model grad hook)")
    ap.add_argument("--old-vocab-size", type=int, default=32000,
                    help="first new-vocab row for --learnable-embeddings-only"
                         " (LLaMA text vocab = 32000)")
    ap.add_argument("--tp", type=int, default=1)
    # Pallas flash attention: measured 1.12x (S=1024) / 1.44x (S=2048)
    # whole-train-step vs the XLA path (PERF.md round 2); shapes below
    # S=256 fall back to XLA automatically
    ap.add_argument("--flash", action="store_true", default=True)
    ap.add_argument("--no-flash", dest="flash", action="store_false")
    ap.add_argument("--output", default="ckpts/llm")
    ap.add_argument("--save-steps", type=int, default=1000)
    ap.add_argument("--log-steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest full TrainState (params + "
                         "AdamW moments + step) from <output>/state and "
                         "continue; data streams are resampled "
                         "(ignore-data-skip semantics, as the reference "
                         "launch scripts)")
    # eval-during-training (CustomTrainer.evaluate cadence,
    # MultiModalLLM/src/train/trainer.py:184-245): generation + caption
    # metrics on a held-out pretokenized prompt set at every save point
    ap.add_argument("--eval-data", default=None,
                    help="json(l) of {'input_ids': [...], 'image_id': i} "
                         "pretokenized eval prompts")
    ap.add_argument("--eval-annotations", default=None,
                    help="json {image_id: [reference captions]}")
    ap.add_argument("--eval-batches", type=int, default=50)
    ap.add_argument("--eval-batch-size", type=int, default=8)
    ap.add_argument("--eval-max-new-tokens", type=int, default=32)
    ap.add_argument("--eval-num-beams", type=int, default=1,
                    help="beam width for eval generation (the reference "
                         "evaluates with num_beams=5, trainer.py:292-294)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seed_tpu.data import (Prefetcher, batched, build_caption_example,
                               collate, shuffle_buffer, tar_source)
    from seed_tpu.models import llama as M
    from seed_tpu.parallel import LLAMA_TP_RULES, auto_mesh
    from seed_tpu.serving import ByteTextTokenizer
    from seed_tpu.train import (Trainer, TrainerConfig, adamw, apply_lora,
                                cosine_with_floor, cross_entropy, init_lora)
    from seed_tpu.utils.checkpoint import CheckpointManager, restore_checkpoint

    cfg = {"8b": M.SEED_LLAMA_8B, "14b": M.SEED_LLAMA_14B,
           "small": M.SMALL_LLAMA, "tiny": M.TINY_LLAMA}[args.model]
    key = jax.random.PRNGKey(args.seed)
    base = (restore_checkpoint(args.llm_ckpt) if args.llm_ckpt
            else M.init_llama(key, cfg, jnp.bfloat16))

    if args.lora:
        lora = init_lora(jax.random.fold_in(key, 1), base, r=16, alpha=32)
        params = {"base": base, "lora": lora}

        def loss_fn(p, batch, rng):
            merged = apply_lora(p["base"], p["lora"])
            logits = M.forward(merged, batch["input_ids"], cfg,
                               attn_mask=batch["attention_mask"], remat=True,
                               use_flash=args.flash)
            return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])
    else:
        params = base

        def loss_fn(p, batch, rng):
            logits = M.forward(p, batch["input_ids"], cfg,
                               attn_mask=batch["attention_mask"], remat=True,
                               use_flash=args.flash)
            return cross_entropy(logits[:, :-1], batch["labels"][:, 1:])

    mesh = auto_mesh(tp=args.tp)
    sched = cosine_with_floor(args.lr, args.warmup, args.steps,
                              args.min_lr_ratio)
    opt = adamw(sched, b1=0.9, b2=0.95, eps=1e-5,
                weight_decay=args.weight_decay, clip_norm=1.0, params=params)
    if args.learnable_embeddings_only:
        from seed_tpu.train import learnable_image_embeddings_only
        opt = learnable_image_embeddings_only(
            opt, args.old_vocab_size, vocab_size=cfg.vocab_size)
    trainer = Trainer(loss_fn, params, opt, mesh, rules=LLAMA_TP_RULES,
                      cfg=TrainerConfig(grad_accum=args.grad_accum))

    tok = ByteTextTokenizer()  # swap for HFTextTokenizer in production

    def example_stream():
        import random
        rng = random.Random(args.seed)
        for rec in tar_source(args.data, cycle_count=None, seed=args.seed):
            if args.mode == "pretrain":
                ex = build_caption_example(rec, tok, args.max_length,
                                           reverse_ratio=0.5, rng=rng)
            else:
                from seed_tpu.data import build_conversation_example
                turns = rec.get("turns") or [
                    {"question": rec.get("question", rec.get("text", "")),
                     "answer": rec.get("answer", ""),
                     "image_ids": rec.get("image_ids")}]
                ex = build_conversation_example(turns, tok, args.max_length)
            if ex is not None:
                yield ex

    micro = args.batch_size // args.grad_accum

    def batch_stream():
        base_iter = batched(shuffle_buffer(example_stream(), 4096, args.seed),
                            micro, collate)
        while True:
            if args.grad_accum == 1:
                yield next(base_iter)
            else:
                micros = [next(base_iter) for _ in range(args.grad_accum)]
                yield {k: np.stack([m[k] for m in micros]) for k in micros[0]}

    data = Prefetcher(batch_stream(), depth=2)
    mgr = CheckpointManager(args.output)
    state_mgr = CheckpointManager(os.path.join(args.output, "state"),
                                  max_to_keep=2)

    def log(step, metrics):
        print(f"step {step}: " + " ".join(f"{k}={v:.4f}"
                                          for k, v in metrics.items()),
              flush=True)

    def run_eval():
        """Generation + caption metrics on the held-out prompts; returns
        the score dict or None when no eval set is configured."""
        if not (args.eval_data and args.eval_annotations):
            return None
        import json

        from seed_tpu.eval.caption_eval import evaluate_captions
        from seed_tpu.eval.eval_readers import iter_json_records
        from seed_tpu.serving import GenerationConfig, LlamaEngine
        merged = (apply_lora(trainer.state.params["base"],
                             trainer.state.params["lora"])
                  if args.lora else trainer.state.params)
        eng = LlamaEngine(merged, cfg, max_len=args.max_length)
        gcfg = GenerationConfig(max_new_tokens=args.eval_max_new_tokens,
                                do_sample=False,
                                num_beams=args.eval_num_beams,
                                eos_token_id=tok.eos_token_id)

        def gen_fn(prompts):
            return eng.generate(prompts, gcfg)

        def stream():
            buf_ids, buf_img = [], []
            for rec in iter_json_records(args.eval_data):
                buf_ids.append([int(t) for t in rec["input_ids"]])
                buf_img.append(rec["image_id"])
                if len(buf_ids) == args.eval_batch_size:
                    yield {"input_ids": buf_ids, "image_id": buf_img}
                    buf_ids, buf_img = [], []
            if buf_ids:
                yield {"input_ids": buf_ids, "image_id": buf_img}

        with open(args.eval_annotations) as f:
            ann = {int(k): v for k, v in json.load(f).items()}
        return evaluate_captions(gen_fn, tok.decode, stream(), ann,
                                 max_batches=args.eval_batches)

    rng = jax.random.PRNGKey(args.seed)
    start0 = 0
    if args.resume:
        restored = trainer.restore_state(state_mgr)
        if restored is not None:
            start0 = restored
            print(f"resumed from step {restored}", flush=True)
    best_metric = None
    for start in range(start0, args.steps, args.save_steps):
        n = min(args.save_steps, args.steps - start)
        trainer.cfg.log_every = args.log_steps
        trainer.train(data, n, rng=jax.random.fold_in(rng, start), log_fn=log)
        scores = run_eval()
        is_best = False
        if scores:
            # CIDEr is the reference's model-selection metric; fall back
            # to BLEU-4 when the pycocoeval-equivalent returns nothing
            key_metric = scores.get("cider", scores.get("bleu4", 0.0))
            is_best = best_metric is None or key_metric > best_metric
            best_metric = key_metric if is_best else best_metric
            log(int(trainer.state.step),
                {f"eval_{k}": v for k, v in scores.items()})
        trainer.save_state(state_mgr)                       # operational
        mgr.save(int(trainer.state.step), trainer.state.params,
                 is_best=is_best)                           # deployment
    print("training done")


if __name__ == "__main__":
    main()
