"""Eval data readers: caption / VQA / image-edit / video streams.

Rebuilds MultiModalLLM/src/data/torchdata_eval.py:87-646 without torchdata:
plain generators over json/jsonl annotation files yielding numpy pixel
batches + question/answer strings, with the reference's fault tolerance
(corrupt images skipped, :280-284) and its canonical prompt phrasings
(:213-276). Video frame sampling reproduces sample_frames (:345-360);
frames load from a directory of images or an .npy stack (cv2 optional).
"""
from __future__ import annotations

import json
import os
import random
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

# canonical eval prompts (torchdata_eval.py:213-276)
VQA_PROMPT_SUFFIX = (" Please provide an accurate answer consisting of only "
                     "one word or phrase.")
CAPTION_PROMPT = ("Please provide an accurate and concise description of the "
                  "given image.")
VIDEO_CAPTION_PROMPT = ("Please provide an accurate and concise description "
                        "of the given video.")


def iter_json_records(path: str) -> Iterator[Dict[str, Any]]:
    """Parse a .json list file or a .jsonl file into records
    (JsonListParser, torchdata_eval.py:154-170 + datapipes JsonlParser)."""
    with open(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == "[":
            for rec in json.load(f):
                yield rec
        else:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)


def _load_image(path: str, image_size: int) -> Optional[np.ndarray]:
    try:
        from PIL import Image
        img = Image.open(path).convert("RGB").resize((image_size, image_size))
        return np.asarray(img, np.uint8)
    except Exception:
        return None     # corrupt image -> skip (torchdata_eval.py:280-284)


def caption_eval_stream(ann_path: str, image_root: str = "",
                        image_size: int = 224,
                        prompt: str = CAPTION_PROMPT
                        ) -> Iterator[Dict[str, Any]]:
    """COCO-caption-style eval (decode_coco_image_text_pair /
    decode_question_answer_pair JourneyDB branch, :249-252): yields
    {"question", "answer", "pixels", "image_id"}."""
    for i, rec in enumerate(iter_json_records(ann_path)):
        pix = _load_image(os.path.join(image_root, rec["image"]), image_size)
        if pix is None:
            continue
        answer = rec.get("caption", rec.get("answer", ""))
        if isinstance(answer, list):
            answer = answer[0] if answer else ""
        yield {"question": prompt, "answer": str(answer), "pixels": pix,
               "image_id": rec.get("image_id", i)}


def vqa_eval_stream(ann_path: str, image_root: str = "",
                    image_size: int = 224,
                    prompt_suffix: str = VQA_PROMPT_SUFFIX
                    ) -> Iterator[Dict[str, Any]]:
    """VQAv2/OK-VQA/VizWiz-style eval (:219-236): question + the one-word
    answer suffix; yields {"question", "answer", "pixels", "question_id"}."""
    for i, rec in enumerate(iter_json_records(ann_path)):
        pix = _load_image(os.path.join(image_root, rec["image"]), image_size)
        if pix is None:
            continue
        answer = rec.get("answer", "")
        answers = ([str(a) for a in answer] if isinstance(answer, list)
                   else [str(answer)])
        yield {"question": str(rec["question"]) + prompt_suffix,
               "answer": answers[0] if answers else "",
               "answers": answers, "pixels": pix,
               "question_id": rec.get("question_id", i)}


def edit_eval_stream(ann_path: str, image_root: str = "",
                     image_size: int = 224) -> Iterator[Dict[str, Any]]:
    """InstructPix2Pix/MagicBrush-style edit eval (decode_edit_pair,
    :307-344): yields {"instruction", "source_pixels", "target_pixels"}."""
    for i, rec in enumerate(iter_json_records(ann_path)):
        src = _load_image(os.path.join(image_root, rec["source_image"]),
                          image_size)
        tgt = _load_image(os.path.join(image_root, rec["target_image"]),
                          image_size)
        if src is None or tgt is None:
            continue
        yield {"instruction": str(rec["instruction"]), "source_pixels": src,
               "target_pixels": tgt, "sample_id": rec.get("sample_id", i)}


def sample_frames(num_frames: int, vlen: int, sample: str = "uniform",
                  fix_start: Optional[int] = None,
                  rng: Optional[random.Random] = None) -> List[int]:
    """Frame index sampling, exact semantics of torchdata_eval.py:345-360:
    split [0, vlen) into num_frames intervals; uniform = midpoints,
    rand = one per interval, fix_start = offset into each interval."""
    rng = rng or random
    acc = min(num_frames, vlen)
    intervals = np.linspace(start=0, stop=vlen, num=acc + 1).astype(int)
    ranges = [(intervals[i], intervals[i + 1] - 1) for i in range(acc)]
    if sample == "rand":
        return [rng.choice(range(lo, max(hi, lo + 1))) for lo, hi in ranges]
    if fix_start is not None:
        return [lo + fix_start for lo, _ in ranges]
    if sample == "uniform":
        return [(lo + hi) // 2 for lo, hi in ranges]
    raise NotImplementedError(sample)


def load_video_frames(path: str, num_frames: int, image_size: int = 224,
                      sample: str = "uniform") -> Optional[np.ndarray]:
    """Load ``num_frames`` sampled frames -> [T, H, W, 3] uint8.

    Sources: a directory of frame images, an .npy [T, H, W, 3] stack, or a
    video file if cv2 is importable (read_frames_cv2 equivalent, :362-386).
    """
    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        idxs = sample_frames(num_frames, len(names), sample)
        frames = [_load_image(os.path.join(path, names[i]), image_size)
                  for i in idxs]
        if any(f is None for f in frames):
            return None
        return np.stack(frames)
    if path.endswith(".npy"):
        arr = np.load(path)
        idxs = sample_frames(num_frames, arr.shape[0], sample)
        from PIL import Image
        out = [np.asarray(Image.fromarray(arr[i]).resize(
            (image_size, image_size)), np.uint8) for i in idxs]
        return np.stack(out)
    try:
        import cv2
    except ImportError:
        return None
    cap = cv2.VideoCapture(path)
    vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    idxs = sample_frames(num_frames, vlen, sample)
    frames = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, i - 1)
        ok, frame = cap.read()
        if ok:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(cv2.resize(frame, (image_size, image_size)))
    cap.release()
    return np.stack(frames) if frames else None


def video_eval_stream(ann_path: str, video_root: str = "",
                      image_size: int = 224, num_frames: int = 4,
                      prompt: str = VIDEO_CAPTION_PROMPT,
                      prompt_suffix: str = VQA_PROMPT_SUFFIX
                      ) -> Iterator[Dict[str, Any]]:
    """Video caption/QA eval (decode_video_pair, :389-528): yields
    {"question", "answer", "frames" [T,H,W,3], "sample_id"}; QA records
    (with a "question" field) get the one-word suffix, caption records get
    the video caption prompt."""
    for i, rec in enumerate(iter_json_records(ann_path)):
        frames = load_video_frames(os.path.join(video_root, rec["video"]),
                                   num_frames, image_size)
        if frames is None:
            continue
        if "question" in rec:
            q = str(rec["question"])
            if not q.endswith("?"):
                q += "?"
            question = q + prompt_suffix
            answer = rec.get("answer", "")
        else:
            question = prompt
            answer = rec.get("caption", "")
        if isinstance(answer, list):
            answer = answer[0] if answer else ""
        yield {"question": question, "answer": str(answer), "frames": frames,
               "sample_id": rec.get("sample_id", i)}


def batch_eval_stream(stream: Iterable[Dict[str, Any]], batch_size: int
                      ) -> Iterator[List[Dict[str, Any]]]:
    buf: List[Dict[str, Any]] = []
    for rec in stream:
        buf.append(rec)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def evaluate_vqa(
    generate_fn: Callable[[List[Dict[str, Any]]], List[str]],
    eval_stream: Iterable[Dict[str, Any]],
    batch_size: int = 16,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """VQA eval loop (eval/eval_vqa.py shape): generate_fn maps a batch of
    reader records to answer strings; scores vqa_accuracy against each
    record's own answer."""
    from .caption_eval import dedupe_by_key, gather_results
    from .metrics import vqa_accuracy
    local: List[Dict] = []
    annotations: Dict[Any, List[str]] = {}
    for i, batch in enumerate(batch_eval_stream(eval_stream, batch_size)):
        if max_batches is not None and i >= max_batches:
            break
        answers = generate_fn(batch)
        for rec, ans in zip(batch, answers):
            qid = rec.get("question_id", rec.get("sample_id"))
            local.append({"question_id": qid, "answer": ans})
            gts = rec.get("answers") or [rec["answer"]]
            # VQA accuracy divides matches by 3: replicate single-annotator
            # ground truths so an exact match scores 1.0, the multi-
            # annotator VQAv2 lists pass through untouched
            annotations[qid] = gts if len(gts) >= 3 else gts * 3
    results = dedupe_by_key(gather_results(local), key="question_id")
    return vqa_accuracy(results, annotations)
