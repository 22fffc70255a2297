#!/usr/bin/env python
"""Offline image -> token-id pre-tokenization (the tokenizer/LLM bridge).

TPU rebuild of MultiModalLLM/src/tools/
extract_image_ids_to_torchdata_parallel.py: streams webdataset-style image
tars, runs the fused SEED-2 encode on TPU, and writes pkl shards
{image_ids, text, metadata} — the format the LLM datapipes consume
(the LLM never sees pixels, SURVEY.md §3.5).

Parallelism: the reference spawns one NCCL process per GPU (:61-74); here
one JAX process per host, the file list sharded by jax.process_index, and
batches pipelined through a background prefetch thread while the TPU
encodes. Optionally also emits the frozen CLIP-ViT-H embedding per image
(the stage-2 distill target).

Usage:
  python scripts/extract_image_ids.py --input 'data/shard_*.tar' \
      --output out/ --checkpoint ckpts/tokenizer --batch-size 512
"""
import argparse
import io
import os
import pickle
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_shard(path, records):
    with tarfile.open(path, "w") as tf:
        for i, rec in enumerate(records):
            data = pickle.dumps(rec)
            info = tarfile.TarInfo(f"{rec.get('__key__', i)}.pkl")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="glob of input image tars")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="native tokenizer checkpoint dir (orbax); random init if absent")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--shard-size", type=int, default=10000)
    ap.add_argument("--emit-clip-embeds", action="store_true",
                    help="also write the frozen CLIP-ViT-H image embedding "
                         "per record (the stage-2 distill target)")
    ap.add_argument("--clip-ckpt", default=None,
                    help="CLIP-ViT-H tower checkpoint (random init if absent)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from seed_tpu.data import Prefetcher, batched, decode_image_text, tar_source
    from seed_tpu.models import SEED_TOKENIZER, encode, init_seed_tokenizer
    from seed_tpu.ops.preprocess import preprocess
    from seed_tpu.utils.checkpoint import restore_checkpoint

    cfg = SEED_TOKENIZER
    if args.checkpoint:
        params = restore_checkpoint(args.checkpoint)
    else:
        print("WARNING: no checkpoint given; using random init (smoke mode)")
        params = init_seed_tokenizer(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    clip_params = None
    if args.emit_clip_embeds:
        from seed_tpu.models.vit import (CLIP_VIT_H, clip_image_embed,
                                         init_clip_vision_projection, init_vit)
        if args.clip_ckpt:
            clip_params = restore_checkpoint(args.clip_ckpt)
        else:
            print("WARNING: no --clip-ckpt; random CLIP embeds (smoke mode)")
            ck = jax.random.PRNGKey(1)
            clip_params = {
                "vit": init_vit(ck, CLIP_VIT_H, jnp.bfloat16),
                "head": init_clip_vision_projection(
                    jax.random.fold_in(ck, 1), CLIP_VIT_H,
                    cfg.image_embed_dim, jnp.bfloat16)}

    @jax.jit
    def encode_batch(p, cp, raw_u8):
        imgs = preprocess(raw_u8, args.image_size, jnp.bfloat16)
        ids = encode(p, imgs, cfg)
        if cp is None:
            return ids, None
        from seed_tpu.models.vit import CLIP_VIT_H, clip_image_embed
        emb = clip_image_embed(cp["vit"], cp["head"], imgs, CLIP_VIT_H)
        return ids, emb.astype(jnp.float32)

    from seed_tpu import native
    from seed_tpu.data import list_shards, shard_for_host

    if native.available():
        # C++ path: mmap tar index + batched reads + parallel libjpeg decode
        files = shard_for_host(list_shards(args.input))

        def native_stream():
            for imgs, keys, texts in native.fast_image_batches(
                    files, args.batch_size, args.image_size):
                yield [{"__key__": k, "pixels": im, "text": t, "meta": {}}
                       for im, k, t in zip(imgs, keys, texts)]

        batches = Prefetcher(native_stream(), depth=4)
    else:
        def to_pixels(sample):
            img = sample["image"].resize((args.image_size, args.image_size))
            return {"__key__": sample["__key__"],
                    "pixels": np.asarray(img, np.uint8),
                    "text": sample.get("text", ""),
                    "meta": sample.get("meta", {})}

        stream = (to_pixels(s) for s in
                  tar_source(args.input, decode=decode_image_text, cycle_count=1))
        batches = Prefetcher(batched(stream, args.batch_size, drop_last=False),
                             depth=4)

    os.makedirs(args.output, exist_ok=True)
    host = jax.process_index()
    records, shard_idx, total = [], 0, 0
    t0 = time.time()
    for batch in batches:
        pixels = np.stack([b["pixels"] for b in batch])
        # pad the tail batch to the compiled shape
        n = len(batch)
        if n < args.batch_size:
            pad = np.zeros((args.batch_size - n, *pixels.shape[1:]), np.uint8)
            pixels = np.concatenate([pixels, pad])
        ids, embs = encode_batch(params, clip_params, jnp.asarray(pixels))
        ids = np.asarray(ids)[:n]
        embs = np.asarray(embs)[:n] if embs is not None else [None] * n
        for rec, row, emb in zip(batch, ids, embs):
            out = {"__key__": rec["__key__"],
                   "image_ids": row.astype(np.int32).tolist(),
                   "text": rec["text"], "metadata": rec["meta"]}
            if emb is not None:
                out["clip_embed"] = emb.astype(np.float32)
            records.append(out)
        total += n
        if len(records) >= args.shard_size:
            path = os.path.join(args.output, f"host{host}_{shard_idx:05d}.tar")
            write_shard(path, records[:args.shard_size])
            records = records[args.shard_size:]
            shard_idx += 1
        if total % (args.batch_size * 10) == 0:
            rate = total / (time.time() - t0)
            print(f"{total} images, {rate:.1f} img/s", flush=True)
    if records:
        write_shard(os.path.join(args.output, f"host{host}_{shard_idx:05d}.tar"),
                    records)
    print(f"done: {total} images in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
