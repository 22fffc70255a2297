#!/usr/bin/env python
"""Host input-pipeline throughput vs training-step consumption.

VERDICT r04 next #4: every training bench so far fed synthetic
device-resident batches; this measures the REAL path — tar -> decode ->
builders -> (collated host batch) — on this 1-core host, against the
measured step times it must feed:

- stage-2 tokenizer training consumes B=32 images / 228 ms
  (140 img/s, PERF.md round 3)
- LLM pretrain consumes B=4 x S=1024 token sequences / 347 ms at S=1024
  (PERF.md round 2 flash table)

Stages measured (one JSON line each):
1. image tar -> PIL decode -> 224x224 resize (python path, tar_source)
2. same via the native C++ loader (tar index + batched pread + libjpeg
   multi-threaded decode+resize, seed_tpu/native)
3. pipeline + Prefetcher feeding a simulated consumer that sleeps the
   measured step time: sustained step/s vs the compute-bound ideal
4. LLM path: pkl-record tar -> build_caption_example -> collate, seq/s

Synthetic shards are generated once under --workdir (default /tmp).

    python scripts/bench_input_pipeline.py
"""
import argparse
import io
import json
import os
import pickle
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_SIZE = 224
SAMPLES_PER_SHARD = 256
N_SHARDS = 4


def make_image_shards(root):
    from PIL import Image
    paths = []
    rng = np.random.RandomState(0)
    for s in range(N_SHARDS):
        path = os.path.join(root, f"bench_imgs_{s:03d}.tar")
        paths.append(path)
        if os.path.exists(path):
            continue
        with tarfile.open(path, "w") as tf:
            for i in range(SAMPLES_PER_SHARD):
                # realistic web JPEG: 512px, smooth content, ~70 KB q90
                arr = rng.randint(0, 256, (64, 64, 3), np.uint8)
                arr = np.asarray(Image.fromarray(arr).resize(
                    (512, 512), Image.BILINEAR))
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "JPEG", quality=90)
                for ext, data in ((".jpg", buf.getvalue()),
                                  (".txt", f"caption {s}/{i}".encode())):
                    info = tarfile.TarInfo(f"{s:03d}{i:05d}{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return paths


def make_pkl_shards(root):
    paths = []
    rng = np.random.RandomState(1)
    for s in range(N_SHARDS):
        path = os.path.join(root, f"bench_pkl_{s:03d}.tar")
        paths.append(path)
        if os.path.exists(path):
            continue
        with tarfile.open(path, "w") as tf:
            for i in range(SAMPLES_PER_SHARD):
                rec = {"image_ids": rng.randint(0, 8192, 32).tolist(),
                       "text": "a caption of moderate length for the "
                               f"record number {i} in shard {s}"}
                data = pickle.dumps(rec)
                info = tarfile.TarInfo(f"{s:03d}{i:05d}.pkl")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return paths


def bench_python_image_path(pattern, batch=32, n_batches=24, draft=False):
    """tar_source + PIL decode + resize + uint8 batch assembly — the
    scripts/train_tokenizer.py example_stream path. ``draft`` uses the
    DCT-domain downscale decode (data.pipeline.resize_draft — the
    shipped training-stream path)."""
    from seed_tpu.data import resize_draft, tar_source
    from seed_tpu.data.pipeline import (decode_image_text,
                                        decode_image_text_lazy)

    def stream():
        dec = decode_image_text_lazy if draft else decode_image_text
        for s in tar_source(pattern, decode=dec,
                            cycle_count=None, seed=0, host_index=0,
                            host_count=1):
            img = (resize_draft(s["image"], IMAGE_SIZE) if draft else
                   s["image"].resize((IMAGE_SIZE, IMAGE_SIZE)))
            yield {"pixels": np.asarray(img, np.uint8),
                   "text": s.get("text", "")}

    it = stream()
    # warm one batch (open files, imports)
    for _ in range(batch):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches * batch):
        next(it)
        n += 1
    dt = time.perf_counter() - t0
    return {"stage": "image_python_draft" if draft else "image_python",
            "img_s": round(n / dt, 1),
            "ms_per_b32": round(dt / n * 32 * 1e3, 1)}


def bench_native_image_path(paths, n_batches=24):
    from seed_tpu import native
    if not native.available():
        return {"stage": "image_native", "skipped": "loader unavailable"}
    it = native.fast_image_batches(paths * 8, 32, IMAGE_SIZE)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        imgs, keys, texts = next(it)
        n += len(imgs)
    dt = time.perf_counter() - t0
    return {"stage": "image_native", "img_s": round(n / dt, 1),
            "ms_per_b32": round(dt / n * 32 * 1e3, 1)}


def bench_prefetch_vs_step(pattern, paths, step_ms, batch=32, n_steps=20,
                           native_loader=False):
    """Prefetcher (background thread) feeding a consumer that 'trains'
    for step_ms per batch: sustained step time vs the ideal max(step,
    input)."""
    from seed_tpu.data import Prefetcher

    if native_loader:
        from seed_tpu import native
        if not native.available():
            return {"stage": "sustained_native", "skipped": "unavailable"}
        raw = native.fast_image_batches(paths * 16, batch, IMAGE_SIZE)
        stream = (imgs for imgs, _, _ in raw)
        tag = "sustained_native"
    else:
        from seed_tpu.data import resize_draft, tar_source
        from seed_tpu.data.pipeline import decode_image_text_lazy

        def gen():
            buf = []
            for s in tar_source(pattern, decode=decode_image_text_lazy,
                                cycle_count=None, seed=0, host_index=0,
                                host_count=1):
                buf.append(np.asarray(
                    resize_draft(s["image"], IMAGE_SIZE), np.uint8))
                if len(buf) == batch:
                    yield np.stack(buf)
                    buf = []
        stream = gen()
        tag = "sustained_python"

    pf = Prefetcher(stream, depth=2)
    it = iter(pf)
    next(it)                      # fill the pipe
    t0 = time.perf_counter()
    for _ in range(n_steps):
        b = next(it)
        time.sleep(step_ms / 1e3)     # the accelerator step (host blocked)
    dt = time.perf_counter() - t0
    per_step = dt / n_steps * 1e3
    return {"stage": tag, "step_ms": step_ms,
            "sustained_ms": round(per_step, 1),
            "input_bound": per_step > step_ms * 1.1,
            "sustained_img_s": round(batch / per_step * 1e3, 1)}


def bench_llm_path(pattern, batch=4, n_batches=64):
    """pkl tar -> build_caption_example -> collate: the LLM pretrain
    host path (B=4 sequences of S<=1024)."""
    from seed_tpu.data import (build_caption_example, collate, tar_source)
    from seed_tpu.serving import ByteTextTokenizer
    tok = ByteTextTokenizer()
    import random as pyrandom
    rng = pyrandom.Random(0)

    def stream():
        for rec in tar_source(pattern, cycle_count=None, seed=0,
                              host_index=0, host_count=1):
            ex = build_caption_example(rec, tok, max_length=1024,
                                       reverse_ratio=0.5, rng=rng)
            if ex is not None:
                yield ex

    it = stream()
    for _ in range(batch):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        exs = [next(it) for _ in range(batch)]
        _ = collate(exs)
        n += batch
    dt = time.perf_counter() - t0
    return {"stage": "llm_pkl_path", "seq_s": round(n / dt, 1),
            "ms_per_b4": round(dt / n * 4 * 1e3, 1)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/seed_tpu_input_bench")
    ap.add_argument("--step-ms", type=float, default=228.0,
                    help="simulated consumer step (stage-2 B=32 measured)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    img_shards = make_image_shards(args.workdir)
    pkl_shards = make_pkl_shards(args.workdir)
    img_pat = os.path.join(args.workdir, "bench_imgs_*.tar")
    pkl_pat = os.path.join(args.workdir, "bench_pkl_*.tar")
    for res in (
            bench_python_image_path(img_pat),
            bench_python_image_path(img_pat, draft=True),
            bench_native_image_path(img_shards),
            bench_prefetch_vs_step(img_pat, img_shards, args.step_ms),
            bench_prefetch_vs_step(img_pat, img_shards, args.step_ms,
                                   native_loader=True),
            bench_llm_path(pkl_pat)):
        print("input " + json.dumps(res), flush=True)
