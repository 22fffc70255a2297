"""Sequence builders: pre-tokenized records -> training examples.

The reference builds sequences in *string space* — formatting image ids as
``<img_00042>`` text and re-tokenizing (torchdata_train.py:100-112,
torchdata_sft.py:476-505). We build directly in *id space*: image codes map
to ids by +32000 (IMAGE_ID_SHIFT), so there is no string round trip and no
tokenizer in the hot path. Semantics preserved:

- caption pairs: bos + [caption][image] or [image][caption] with
  ``reverse_ratio`` (t2i vs i2t, torchdata_train.py:109-114) + eos;
  ``mask_left_label`` puts -100 on the conditioning prefix through BOI/EOI
  (:135-147)
- SFT conversations: per turn ``USER: <img>q\nASSISTANT: a``; -100 on all
  question spans; bos/eos; pad to max_length with -100 labels
  (torchdata_sft.py:453-529)
- batches collate to numpy {input_ids, attention_mask, labels} int32
"""
from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .. import BOI_TOKEN_ID, EOI_TOKEN_ID, IMAGE_ID_SHIFT

IGNORE_INDEX = -100


def clean_caption(caption: str, max_words: int = 50) -> str:
    """Caption cleanup (blip_caption, blip_processors.py:28-69): lowercase,
    strip odd punctuation, collapse whitespace, truncate words."""
    import re as _re
    cap = _re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    cap = _re.sub(r"\s{2,}", " ", cap).rstrip("\n").strip(" ")
    words = cap.split(" ")
    if len(words) > max_words:
        cap = " ".join(words[:max_words])
    return cap


def image_token_ids(image_ids: Sequence[int]) -> List[int]:
    return ([BOI_TOKEN_ID] + [int(i) + IMAGE_ID_SHIFT for i in image_ids]
            + [EOI_TOKEN_ID])


def _pad(ids: List[int], mask: List[int], labels: List[int], max_length: int,
         pad_id: int = 0):
    ids, mask, labels = ids[:max_length], mask[:max_length], labels[:max_length]
    n = max_length - len(ids)
    return (ids + [pad_id] * n, mask + [0] * n, labels + [IGNORE_INDEX] * n)


def build_caption_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 128,
    reverse_ratio: float = 0.5,
    mask_left_label: bool = False,
    caption_prompts: Optional[Sequence[str]] = None,
    rng: Optional[random.Random] = None,
) -> Optional[Dict[str, np.ndarray]]:
    rng = rng or random
    text = record.get("text", "")
    if not str(text).strip(" ;,[]{}'\".?:"):
        return None  # empty-caption filter (torchdata_train.py:131-133)
    if caption_prompts:
        text = rng.choice(list(caption_prompts)).format(text)

    img = image_token_ids(record["image_ids"])
    txt = text_tokenizer.encode(text)
    reverse = rng.random() < reverse_ratio
    body = (img + txt) if reverse else (txt + img)
    ids = [text_tokenizer.bos_token_id] + body + [text_tokenizer.eos_token_id]
    mask = [1] * len(ids)
    labels = list(ids)

    if mask_left_label:
        # mask conditioning prefix: through EOI (i2t) or through BOI (t2i)
        anchor = EOI_TOKEN_ID if reverse else BOI_TOKEN_ID
        idx = ids.index(anchor)
        labels[:idx + 1] = [IGNORE_INDEX] * (idx + 1)

    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_conversation_example(
    turns: Sequence[Dict[str, Any]],
    text_tokenizer,
    max_length: int = 1024,
    s_token: str = "USER:",
    e_token: str = "ASSISTANT:",
    sep: str = "\n",
) -> Dict[str, np.ndarray]:
    """turns: [{"question": str, "answer": str, "image_ids": optional}].

    First turn carries the image tokens before the question
    (torchdata_sft.py:490-494); question spans are -100.
    """
    ids: List[int] = []
    labels: List[int] = []
    for i, turn in enumerate(turns):
        q_ids: List[int] = []
        prefix = (s_token + " ") if i == 0 else (sep + s_token + " ")
        q_ids.extend(text_tokenizer.encode(prefix))
        if i == 0 and turn.get("image_ids") is not None:
            q_ids.extend(image_token_ids(turn["image_ids"]))
        q_ids.extend(text_tokenizer.encode(str(turn["question"]) + sep + e_token))
        a = str(turn["answer"])
        if not a.endswith("."):
            a = a + "."
        a_ids = text_tokenizer.encode(a)
        ids.extend(q_ids + a_ids)
        labels.extend([IGNORE_INDEX] * len(q_ids) + a_ids)

    ids = [text_tokenizer.bos_token_id] + ids + [text_tokenizer.eos_token_id]
    labels = [IGNORE_INDEX] + labels + [text_tokenizer.eos_token_id]
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_interleaved_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 1024,
    reverse_ratio: float = 0.5,
    max_images: Optional[int] = None,
    rng: Optional[random.Random] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """MMC4-style interleaved documents (torchdata_train.py:473-537):
    record = {"image_ids": [codes | None, ...], "texts": [None | str, ...]}
    with image-first swapping at ``reverse_ratio`` and a ``max_images`` cap.
    """
    rng = rng or random
    image_list = list(record["image_ids"])
    text_list = list(record["texts"])
    if rng.random() < reverse_ratio:
        # swap each (text, image) pair so images come first (:488-496)
        idx = 0
        while idx < len(image_list) - 1:
            if image_list[idx] is not None:
                image_list[idx], image_list[idx + 1] = \
                    image_list[idx + 1], image_list[idx]
                text_list[idx], text_list[idx + 1] = \
                    text_list[idx + 1], text_list[idx]
                idx += 2
            else:
                idx += 1

    ids: List[int] = [text_tokenizer.bos_token_id]
    n_img = 0
    for img, txt in zip(image_list, text_list):
        if (img is None) == (txt is None):
            return None  # malformed record: exactly one must be set (:501)
        if img is not None:
            if max_images is not None and n_img >= max_images:
                break
            ids.extend(image_token_ids(img))
            n_img += 1
        else:
            ids.extend(text_tokenizer.encode(txt))
            if max_images is not None and n_img >= max_images:
                break
    ids.append(text_tokenizer.eos_token_id)
    mask = [1] * len(ids)
    labels = list(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_video_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 256,
    image_id_length: int = 32,
    num_frames: int = 4,
) -> Optional[Dict[str, np.ndarray]]:
    """Video captioning (torchdata_train.py:1047-1106): ``num_frames``
    consecutive 32-id frames, each in its own BOI/EOI block, caption
    supervised, frames masked."""
    if "image_ids" not in record or "answer" not in record:
        return None
    flat = record["image_ids"]
    if flat and isinstance(flat[0], (list, np.ndarray)):
        frames = [list(f) for f in flat]
    else:
        frames = [flat[i * image_id_length:(i + 1) * image_id_length]
                  for i in range(num_frames)]
    ids: List[int] = []
    labels: List[int] = []
    for f in frames:
        seg = image_token_ids(f)
        ids.extend(seg)
        labels.extend([IGNORE_INDEX] * len(seg))
    cap = text_tokenizer.encode(str(record["answer"]))
    ids.extend(cap)
    labels.extend(cap)
    ids = [text_tokenizer.bos_token_id] + ids + [text_tokenizer.eos_token_id]
    labels = [IGNORE_INDEX] + labels + [text_tokenizer.eos_token_id]
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_edit_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 256,
) -> Optional[Dict[str, np.ndarray]]:
    """Image editing (torchdata_sft.py:292 source -> instruction -> target):
    supervise only the target image tokens."""
    src = record.get("source_image_ids")
    tgt = record.get("target_image_ids")
    instr = record.get("instruction", record.get("text", ""))
    if src is None or tgt is None:
        return None
    prefix = image_token_ids(src) + text_tokenizer.encode(str(instr))
    target = image_token_ids(tgt)
    ids = [text_tokenizer.bos_token_id] + prefix + target \
        + [text_tokenizer.eos_token_id]
    labels = ([IGNORE_INDEX] * (1 + len(prefix)) + target
              + [text_tokenizer.eos_token_id])
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_story_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 1024,
) -> Optional[Dict[str, np.ndarray]]:
    """Visual storytelling (VIST, torchdata_sft.py:681): alternating
    sentence/image sequence, everything after the first image supervised."""
    steps = record.get("story")  # [{"text": str, "image_ids": [...]}, ...]
    if not steps:
        return None
    ids: List[int] = []
    labels: List[int] = []
    for i, step in enumerate(steps):
        t = text_tokenizer.encode(str(step.get("text", "")))
        seg = t + (image_token_ids(step["image_ids"])
                   if step.get("image_ids") is not None else [])
        ids.extend(seg)
        # first frame is context; the continuation is supervised
        labels.extend(([IGNORE_INDEX] * len(seg)) if i == 0 else seg)
    ids = [text_tokenizer.bos_token_id] + ids + [text_tokenizer.eos_token_id]
    labels = [IGNORE_INDEX] + labels + [text_tokenizer.eos_token_id]
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_multi_image_qa_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 512,
    s_token: str = "USER:",
    e_token: str = "ASSISTANT:",
    sep: str = "\n",
) -> Optional[Dict[str, np.ndarray]]:
    """Multi-image QA (MIMIC-IT CGD spot-the-difference, torchdata_sft.py:612):
    N images in the question prefix, answer supervised."""
    images = record.get("images_ids") or record.get("image_ids_list")
    if not images:
        return None
    q_ids = text_tokenizer.encode(s_token + " ")
    for codes in images:
        q_ids.extend(image_token_ids(codes))
    q_ids.extend(text_tokenizer.encode(
        str(record.get("question", "")) + sep + e_token))
    a = str(record.get("answer", ""))
    a_ids = text_tokenizer.encode(a if a.endswith(".") else a + ".")
    ids = [text_tokenizer.bos_token_id] + q_ids + a_ids \
        + [text_tokenizer.eos_token_id]
    labels = ([IGNORE_INDEX] * (1 + len(q_ids)) + a_ids
              + [text_tokenizer.eos_token_id])
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


def build_retrieval_augmented_example(
    record: Dict[str, Any],
    text_tokenizer,
    max_length: int = 256,
    num_retrieved: int = 2,
    rng: Optional[random.Random] = None,
) -> Optional[Dict[str, np.ndarray]]:
    """Retrieval-augmented caption->image (torchdata_train.py:600-697):
    retrieved neighbor captions prefix the target caption; only the target
    image tokens are supervised."""
    rng = rng or random
    retrieved = list(record.get("retrieved_texts", []))[:num_retrieved]
    text = record.get("text", "")
    if not str(text).strip():
        return None
    prefix_ids: List[int] = []
    for r in retrieved:
        prefix_ids.extend(text_tokenizer.encode(str(r) + " "))
    prefix_ids.extend(text_tokenizer.encode(str(text)))
    target = image_token_ids(record["image_ids"])
    ids = [text_tokenizer.bos_token_id] + prefix_ids + target \
        + [text_tokenizer.eos_token_id]
    labels = ([IGNORE_INDEX] * (1 + len(prefix_ids)) + target
              + [text_tokenizer.eos_token_id])
    mask = [1] * len(ids)
    ids, mask, labels = _pad(ids, mask, labels, max_length)
    return {"input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.asarray(mask, np.int32),
            "labels": np.asarray(labels, np.int32)}


# generation prompt templates for t2i SFT (torchdata_sft.py:17-37 ships 20;
# representative set, used by build_caption_example(caption_prompts=...))
GENERATION_PROMPTS = [
    "Please generate an image based on the following description: {}",
    "Create an image depicting: {}",
    "Generate an image of {}",
    "Show me a picture of {}",
    "Can you draw {}?",
    "I want to see an image of {}",
    "Produce an image that matches this caption: {}",
    "Visualize the following: {}",
]


def collate(examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples], 0) for k in keys}
