"""Generation-based evaluation loops.

Rebuilds CustomTrainer.evaluate (MultiModalLLM/src/train/trainer.py:
184-245): run generation over an eval stream, gather results across hosts
(all_gather_object -> multihost_utils.process_allgather here), dedupe by
image_id, score with the caption metrics. Also the caption->image
generation eval harness shape (eval/eval_caption_to_images.py: seeded
generation at fixed guidance) for FID pipelines.
"""
from __future__ import annotations

import json
from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np

from .metrics import caption_metrics


def gather_results(local: List[Dict]) -> List[Dict]:
    """Cross-host gather of python records (trainer.py:32-38)."""
    import jax
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils
    blob = json.dumps(local).encode()
    n = np.frombuffer(blob, np.uint8)
    # pad to the max length across hosts, gather, decode
    sizes = multihost_utils.process_allgather(np.asarray([len(n)]))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:len(n)] = n
    all_blobs = multihost_utils.process_allgather(padded)
    out: List[Dict] = []
    for row, size in zip(np.atleast_2d(all_blobs), sizes.reshape(-1)):
        out.extend(json.loads(bytes(row[:int(size)]).decode()))
    return out


def dedupe_by_key(results: List[Dict], key: str = "image_id") -> List[Dict]:
    seen, out = set(), []
    for r in results:
        if r[key] not in seen:
            seen.add(r[key])
            out.append(r)
    return out


def evaluate_captions(
    generate_fn: Callable[[List[List[int]]], List[List[int]]],
    decode_fn: Callable[[List[int]], str],
    eval_stream: Iterable[Dict[str, Any]],
    annotations: Dict[int, List[str]],
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """eval_stream yields {"input_ids": [B, N] prompts, "image_id": [B]}.

    Returns BLEU/CIDEr metrics over the (cross-host-gathered, deduped)
    generations — the compute_metrics contract (trainer.py:331-364).
    """
    local: List[Dict] = []
    for i, batch in enumerate(eval_stream):
        if max_batches is not None and i >= max_batches:
            break
        prompts = [list(map(int, row)) for row in batch["input_ids"]]
        outs = generate_fn(prompts)
        for img_id, out_ids in zip(batch["image_id"], outs):
            local.append({"image_id": int(img_id),
                          "caption": decode_fn(out_ids)})
    results = dedupe_by_key(gather_results(local))
    return caption_metrics(results, annotations)


def generate_images_for_fid(
    decode_image_fn: Callable[[np.ndarray], np.ndarray],
    codes_stream: Iterable[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
    max_batches: Optional[int] = None,
) -> np.ndarray:
    """Caption->image eval harness: decode code batches to pixels, extract
    features for FID (eval_caption_to_images.py shape: fixed seed and
    guidance live inside decode_image_fn)."""
    feats = []
    for i, codes in enumerate(codes_stream):
        if max_batches is not None and i >= max_batches:
            break
        images = decode_image_fn(np.asarray(codes))
        feats.append(np.asarray(feature_fn(images)))
    return np.concatenate(feats, axis=0) if feats else np.zeros((0, 1))
