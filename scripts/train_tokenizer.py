#!/usr/bin/env python
"""SEED tokenizer training entry (stage 1: causal Q-Former contrastive;
stage 2: codebook distillation).

TPU rebuild of SEED_Tokenizer/train.py + lavis runners: one entry, two
stages, data from webdataset-style image(+text) tars, FSDP over the mesh,
requires-grad-filtered checkpoints (runner_base.py:411-434 semantics).

  python scripts/train_tokenizer.py --stage 1 --data 'cc3m/*.tar' \
      --steps 100000 --batch-size 64 --lr 3e-5 --output ckpts/stage1
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, choices=[1, 2], required=True)
    ap.add_argument("--arch", choices=["full", "tiny"], default="full",
                    help="tiny = smoke-test scale")
    ap.add_argument("--data", required=True)
    ap.add_argument("--init-ckpt", default=None,
                    help="stage 2 initializes from the stage-1 checkpoint")
    ap.add_argument("--steps", type=int, default=100000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--max-text-len", type=int, default=32)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--warmup", type=int, default=5000)
    ap.add_argument("--lr-sched", choices=["cosine", "step"],
                    default="cosine",
                    help="LAVIS linear_warmup_cosine_lr (default) or "
                         "linear_warmup_step_lr (optims.py:13-52)")
    ap.add_argument("--lr-decay-rate", type=float, default=0.9,
                    help="per-epoch decay for --lr-sched step")
    ap.add_argument("--steps-per-epoch", type=int, default=10000,
                    help="epoch length driving the step schedule")
    ap.add_argument("--output", required=True)
    ap.add_argument("--save-steps", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true",
                    help="restore model+optimizer+step from <output>/state "
                         "and continue (runner_base.py:656-692 semantics)")
    ap.add_argument("--eval-data", default=None,
                    help="held-out tar glob: eval loss at every save point "
                         "drives is_best checkpointing")
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--distill-head", choices=["reverse_qformer", "image_down"],
                    default="reverse_qformer",
                    help="stage-2 image-distill head; reverse_qformer is the "
                         "reference training default "
                         "(blip2_qformer_codebook_all_image.py:84)")
    # Pallas short-seq attention for the (frozen) EVA-ViT forward —
    # measured 1.27x the bare ViT at S=257 (PERF.md round 2); grads
    # never flow through the frozen tower, so numerics only shift the
    # frozen features by the fp32-reassociation epsilon
    ap.add_argument("--flash-vit", action="store_true", default=True)
    ap.add_argument("--no-flash-vit", dest="flash_vit",
                    action="store_false")
    ap.add_argument("--clip-ckpt", default=None,
                    help="frozen CLIP-ViT-H tower checkpoint for the stage-2 "
                         "distill target (random init if absent: smoke mode)")
    args = ap.parse_args()
    lr = args.lr or (3e-5 if args.stage == 1 else 1e-4)  # project yaml defaults

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from seed_tpu.data import (Prefetcher, batched, decode_image_text,
                               decode_image_text_lazy, resize_draft,
                               shuffle_buffer, tar_source)
    from seed_tpu.models import SEED_TOKENIZER, init_seed_tokenizer
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.parallel import auto_mesh
    from seed_tpu.serving import ByteTextTokenizer
    from seed_tpu.train import (Trainer, adamw, warmup_cosine,
                            warmup_step_decay)
    from seed_tpu.train.optim import masked_trainable
    from seed_tpu.train.tokenizer_training import (
        STAGE1_TRAINABLE, STAGE2_TRAINABLE, Stage1Config, Stage2Config,
        init_itm_head, init_stage1_head, stage1_total_loss,
        stage2_loss_scalar)
    from seed_tpu.utils.checkpoint import (CheckpointManager, filter_tree,
                                           merge_tree, restore_checkpoint)

    if args.arch == "tiny":
        from seed_tpu.models import TINY_TOKENIZER
        base_cfg = TINY_TOKENIZER
        args.image_size = base_cfg.vit.image_size
    else:
        base_cfg = SEED_TOKENIZER
    tok_cfg = dataclasses.replace(
        base_cfg,
        vit=dataclasses.replace(base_cfg.vit, use_flash=args.flash_vit),
        qformer=dataclasses.replace(base_cfg.qformer,
                                    with_text=(args.stage == 1)),
        with_recon_blocks=(args.stage == 2),
        use_qformer_image=(args.stage == 2
                           and args.distill_head == "reverse_qformer"))
    key = jax.random.PRNGKey(args.seed)
    tok_params = init_seed_tokenizer(key, tok_cfg)
    if args.init_ckpt:
        # checkpoints hold the trainable subtree only (requires-grad-filtered,
        # runner_base.py:411-434); merge over the fresh full tree. A stage-1
        # checkpoint is wrapped as {"tokenizer": ..., "head": ...}.
        restored = restore_checkpoint(args.init_ckpt)
        if isinstance(restored, dict) and "tokenizer" in restored:
            restored = restored["tokenizer"]
        tok_params = merge_tree(tok_params, restored)

    text_tok = ByteTextTokenizer()
    mesh = auto_mesh()

    if args.stage == 1:
        from seed_tpu.models.qformer import init_lm_head
        s1 = Stage1Config(tokenizer=tok_cfg)
        params = {"tokenizer": tok_params,
                  "head": init_stage1_head(jax.random.fold_in(key, 1), s1),
                  "itm_head": init_itm_head(jax.random.fold_in(key, 3), s1),
                  "lm_head": init_lm_head(jax.random.fold_in(key, 4),
                                          tok_cfg.qformer)}

        def loss_fn(p, batch, rng):
            # joint ITC + ITM (sim-weighted hard negatives) + caption LM
            # (blip2_qformer_casual.py:199-296)
            return stage1_total_loss(p, batch, rng, s1)[0]
        trainable_pat = STAGE1_TRAINABLE
    else:
        s2 = Stage2Config(tokenizer=tok_cfg)
        params = tok_params

        def loss_fn(p, batch, rng):
            return stage2_loss_scalar(p, batch, rng, s2)
        trainable_pat = STAGE2_TRAINABLE

        # frozen CLIP-ViT-H distill-target tower, computed inline per batch
        # (blip2_qformer_codebook_all_image.py:283-286 clip_model(image))
        from seed_tpu.models.vit import (CLIP_VIT_H, clip_image_embed,
                                         init_clip_vision_projection, init_vit)
        clip_cfg = (CLIP_VIT_H if args.arch == "full" else
                    dataclasses.replace(tok_cfg.vit, qkv_bias="full",
                                        ln_pre=True, patch_bias=False))
        if args.clip_ckpt:
            clip_params = restore_checkpoint(args.clip_ckpt)
        else:
            print("WARNING: no --clip-ckpt; random CLIP targets (smoke mode)")
            ck = jax.random.fold_in(key, 2)
            clip_params = {
                "vit": init_vit(ck, clip_cfg, jnp.bfloat16),
                "head": init_clip_vision_projection(
                    jax.random.fold_in(ck, 1), clip_cfg,
                    tok_cfg.image_embed_dim, jnp.bfloat16)}

        clip_fn = jax.jit(lambda cp, imgs: clip_image_embed(
            cp["vit"], cp["head"], imgs.astype(jnp.bfloat16), clip_cfg
        ).astype(jnp.float32))

    # freeze mask: frozen towers get exactly zero updates (stop_gradient
    # zeroes their grads but AdamW weight decay would still shrink them)
    if args.lr_sched == "step":
        sched = warmup_step_decay(lr, args.warmup, args.steps_per_epoch,
                                  decay_rate=args.lr_decay_rate)
    else:
        sched = warmup_cosine(lr, args.warmup, args.steps)
    opt = masked_trainable(
        adamw(sched,
              b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.05, params=params),
        params, trainable_pat)
    trainer = Trainer(loss_fn, params, opt, mesh)

    def example_stream():
        for s in tar_source(args.data, decode=decode_image_text_lazy,
                            cycle_count=None, seed=args.seed):
            try:
                img = resize_draft(s["image"], args.image_size)
            except Exception:      # corrupt payload past the header: skip
                continue
            ex = {"pixels": np.asarray(img, np.uint8),
                  "text": s.get("text", ""),
                  "clip_embed": s.get("clip_embed")}
            yield ex

    def collate(items):
        pixels = np.stack([i["pixels"] for i in items])
        imgs = np.asarray(
            preprocess(jnp.asarray(pixels), args.image_size, jnp.float32))
        batch = {"images": imgs}
        if args.stage == 1:
            T = args.max_text_len
            ids = np.zeros((len(items), T), np.int32)
            pad = np.zeros((len(items), T), np.int32)
            for r, it in enumerate(items):
                enc = text_tok.encode(it["text"])[:T]
                ids[r, :len(enc)] = enc
                pad[r, :len(enc)] = 1
            batch.update(text_ids=ids, text_pad=pad)
        else:
            # distill targets: precomputed embeds ride the records if the
            # extractor emitted them (--emit-clip-embeds); otherwise computed
            # inline by the frozen CLIP tower (reference :283-286)
            pre = [i.get("clip_embed") for i in items]
            if all(p is not None for p in pre):
                batch["clip_embeds"] = np.stack(pre).astype(np.float32)
            else:
                batch["clip_embeds"] = np.asarray(
                    clip_fn(clip_params, jnp.asarray(imgs)))
        return batch

    data = Prefetcher(batched(shuffle_buffer(example_stream(), 2000,
                                             args.seed),
                              args.batch_size, collate), depth=2)
    mgr = CheckpointManager(args.output)
    state_mgr = CheckpointManager(os.path.join(args.output, "state"),
                                  max_to_keep=2)
    rng = jax.random.PRNGKey(args.seed)

    def log(step, m):
        print(f"step {step}: " + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
              flush=True)

    eval_loss_fn = jax.jit(loss_fn)

    def run_eval():
        """Held-out loss (the LAVIS runner's val-split evaluation,
        runner_base.py:446-480: agg metric drives best-ckpt tracking)."""
        if not args.eval_data:
            return None
        def ex_stream():
            for s in tar_source(args.eval_data, decode=decode_image_text,
                                cycle_count=1, seed=args.seed):
                img = resize_draft(s["image"], args.image_size)
                yield {"pixels": np.asarray(img, np.uint8),
                       "text": s.get("text", ""),
                       "clip_embed": s.get("clip_embed")}
        losses = []
        erng = jax.random.PRNGKey(0)
        for i, batch in enumerate(batched(ex_stream(), args.batch_size,
                                          collate)):
            if i >= args.eval_batches:
                break
            losses.append(float(eval_loss_fn(
                trainer.state.params, batch, jax.random.fold_in(erng, i))))
        return float(np.mean(losses)) if losses else None

    start0 = 0
    if args.resume:
        restored = trainer.restore_state(state_mgr)
        if restored is not None:
            start0 = restored
            print(f"resumed from step {restored}", flush=True)
    best_loss = None
    for start in range(start0, args.steps, args.save_steps):
        n = min(args.save_steps, args.steps - start)
        trainer.train(data, n, rng=jax.random.fold_in(rng, start), log_fn=log)
        eval_loss = run_eval()
        is_best = False
        if eval_loss is not None:
            is_best = best_loss is None or eval_loss < best_loss
            best_loss = eval_loss if is_best else best_loss
            log(int(trainer.state.step), {"eval_loss": eval_loss})
        trainer.save_state(state_mgr)            # full operational state
        # requires-grad-filtered checkpoint (trainable params only,
        # runner_base.py:418-424); restore merges over a fresh full tree
        trainable = filter_tree(trainer.state.params, trainable_pat)
        mgr.save(int(trainer.state.step), trainable, is_best=is_best)
    print("training done")


if __name__ == "__main__":
    main()
