"""Streaming input pipeline — the torchdata/webdataset replacement.

Reference graph (MultiModalLLM/src/data/torchdata_train.py:265-281):
FileLister(*.tar) -> cycle -> shuffle -> sharding_filter -> open ->
load_from_tar_wo_exception -> decode -> webdataset-group -> map -> filter ->
shuffle(4096) -> batch -> collate; sources mixed by SampleMultiplexer with
per-source weights (build_multi_datapipes :363-385).

TPU-native equivalents, as composable generators:
- per-host shard assignment by jax.process_index (replaces
  DistributedReadingService + sharding_filter)
- corrupt-tar tolerance (datapipes.py:16-44 TarArchiveLoaderWoException)
- deterministic seeding per (host, epoch) like pytorch_worker_seed
  (data.py:139) — resume uses the reference's own ignore_data_skip
  semantics (streams are resampled, not fast-forwarded)
- double-buffered host->device feeding so input never blocks the TPU step.
"""
from __future__ import annotations

import glob as globlib
import io
import itertools
import json
import logging
import pickle
import random
import tarfile
import threading
import queue as queuelib
from typing import (Any, Callable, Dict, Iterable, Iterator, List, Optional,
                    Sequence, Tuple)

import numpy as np

log = logging.getLogger("seed_tpu.data")


# ----------------------------- shard listing -------------------------------

def list_shards(pattern: str, shuffle_seed: Optional[int] = None) -> List[str]:
    files = sorted(globlib.glob(pattern))
    if shuffle_seed is not None:
        random.Random(shuffle_seed).shuffle(files)
    return files


def shard_for_host(files: Sequence[str], host_index: Optional[int] = None,
                   host_count: Optional[int] = None) -> List[str]:
    """Round-robin shard assignment per host (DistributedReadingService)."""
    if host_index is None:
        import jax
        host_index, host_count = jax.process_index(), jax.process_count()
    return [f for i, f in enumerate(files) if i % host_count == host_index]


# ----------------------------- tar reading ---------------------------------

def iter_tar(path: str, suffixes: Optional[Sequence[str]] = None
             ) -> Iterator[Tuple[str, bytes]]:
    """Yield (member_name, bytes); skip corrupt archives instead of raising
    (load_from_tar_wo_exception semantics)."""
    try:
        with tarfile.open(path, "r") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                if suffixes and not any(member.name.endswith(s) for s in suffixes):
                    continue
                f = tf.extractfile(member)
                if f is None:
                    continue
                yield member.name, f.read()
    except (tarfile.TarError, EOFError, OSError) as e:
        log.warning("skipping corrupt tar %s: %s", path, e)


def group_by_key(stream: Iterator[Tuple[str, bytes]]
                 ) -> Iterator[Dict[str, bytes]]:
    """webdataset grouping: 'abc.jpg','abc.txt' -> {'__key__','jpg','txt'}.

    Tolerates duplicate keys by flushing the previous sample
    (group_by_keys_nothrow semantics for the LAION dup-key bug,
    src/data/base.py:427-452)."""
    current: Dict[str, Any] = {}
    for name, data in stream:
        key, _, ext = name.rpartition("/")[2].partition(".")
        if current and current.get("__key__") != key:
            yield current
            current = {}
        current["__key__"] = key
        current[ext] = data
    if current:
        yield current


def decode_pkl_records(sample: Dict[str, bytes]) -> Optional[Dict[str, Any]]:
    """Pre-tokenized record decode (the ShardWriter pkl format of
    extract_image_ids_to_torchdata_parallel.py:106-127)."""
    if "pkl" not in sample:
        return None
    try:
        return pickle.loads(sample["pkl"])
    except Exception as e:  # corrupt record: skip, don't crash the epoch
        log.warning("bad pkl record %s: %s", sample.get("__key__"), e)
        return None


def decode_image_text_lazy(sample: Dict[str, bytes]) -> Optional[Dict[str, Any]]:
    """Like :func:`decode_image_text` but the PIL image stays LAZY (no
    convert, no pixel decode): the consumer's :func:`resize_draft` can
    then set the JPEG draft scale BEFORE the only decode happens — the
    eager path's convert("RGB") forces a full-resolution decode that
    makes a later draft() a no-op. Corrupt payloads past the header
    surface at resize time — wrap the consumer's resize in try/except
    (train_tokenizer.py does)."""
    img_ext = next((e for e in ("jpg", "jpeg", "png", "webp") if e in sample),
                   None)
    if img_ext is None:
        return None
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(sample[img_ext]))
    except Exception as e:
        log.warning("bad image %s: %s", sample.get("__key__"), e)
        return None
    out = {"__key__": sample.get("__key__"), "image": img}
    if "txt" in sample:
        out["text"] = sample["txt"].decode("utf-8", errors="replace")
    if "json" in sample:
        try:
            out["meta"] = json.loads(sample["json"])
        except Exception:
            pass
    return out


def resize_draft(img, size: int):
    """Training-path resize with JPEG draft decode: libjpeg decodes at
    the smallest DCT scale >= target (up to 8x fewer IDCT coefficients),
    then one SIMD resize — measured 2.3x the plain decode+resize rate on
    512px web JPEGs on this 1-core host (PERF.md round 5). The pixels
    differ from a full-resolution decode at the last bit, so this is for
    TRAINING streams only; inference token parity keeps the bit-exact
    path (ops/preprocess)."""
    img.draft("RGB", (size, size))   # no-op for non-JPEG / already-loaded
    return img.convert("RGB").resize((size, size))


def decode_image_text(sample: Dict[str, bytes]) -> Optional[Dict[str, Any]]:
    """Raw webdataset sample: jpg + txt (+ json) -> dict with PIL image."""
    img_ext = next((e for e in ("jpg", "jpeg", "png", "webp") if e in sample),
                   None)
    if img_ext is None:
        return None
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(sample[img_ext])).convert("RGB")
    except Exception as e:
        log.warning("bad image %s: %s", sample.get("__key__"), e)
        return None
    out = {"__key__": sample.get("__key__"), "image": img}
    if "txt" in sample:
        out["text"] = sample["txt"].decode("utf-8", errors="replace")
    if "json" in sample:
        try:
            out["meta"] = json.loads(sample["json"])
        except Exception:
            pass
    return out


# ----------------------------- combinators ---------------------------------

def cycle(items: Sequence[str], count: Optional[int] = None,
          seed: Optional[int] = None) -> Iterator[str]:
    """Repeat the file list ``count`` times (None = forever), reshuffling
    per epoch with a deterministic per-epoch seed (detshuffle2 semantics,
    src/data/data.py:159)."""
    epoch = 0
    while count is None or epoch < count:
        files = list(items)
        if seed is not None:
            random.Random(seed + epoch).shuffle(files)
        yield from files
        epoch += 1


def resampled_shards(files: Sequence[str], seed: int = 0,
                     epoch_size: Optional[int] = None) -> Iterator[str]:
    """Sample shards WITH replacement (ResampledShards2, src/data/data.py:192)
    — the 'infinite stream, statistically balanced' webdataset idiom."""
    rng = random.Random(seed)
    count = 0
    while True:
        yield rng.choice(list(files))
        count += 1
        if epoch_size is not None and count >= epoch_size:
            return


def shuffle_buffer(stream: Iterator, size: int, seed: int = 0) -> Iterator:
    rng = random.Random(seed)
    buf: List[Any] = []
    for item in stream:
        if len(buf) < size:
            buf.append(item)
            continue
        i = rng.randrange(size)
        yield buf[i]
        buf[i] = item
    rng.shuffle(buf)
    yield from buf


def batched(stream: Iterator, batch_size: int,
            collate: Optional[Callable] = None, drop_last: bool = True
            ) -> Iterator:
    it = iter(stream)
    while True:
        chunk = list(itertools.islice(it, batch_size))
        if not chunk or (drop_last and len(chunk) < batch_size):
            return
        yield collate(chunk) if collate else chunk


def sample_multiplexer(sources: Dict[str, Iterator], weights: Dict[str, float],
                       seed: int = 0) -> Iterator:
    """Weighted sampling across sources; a source that ends is dropped
    (SampleMultiplexer semantics). Ends when all sources end."""
    rng = random.Random(seed)
    live = {k: iter(v) for k, v in sources.items()}
    w = {k: float(weights.get(k, 1.0)) for k in live}
    while live:
        names = list(live)
        probs = np.asarray([w[n] for n in names])
        pick = rng.choices(names, weights=probs.tolist(), k=1)[0]
        try:
            yield next(live[pick])
        except StopIteration:
            del live[pick]


def multiplexer_longest(sources: Dict[str, Iterator], seed: int = 0) -> Iterator:
    """Round-robin until every source is exhausted (MultiplexerLongest)."""
    live = {k: iter(v) for k, v in sources.items()}
    while live:
        for name in list(live):
            try:
                yield next(live[name])
            except StopIteration:
                del live[name]


# --------------------------- device feeding --------------------------------

class Prefetcher:
    """Background-thread prefetch of host batches (the MultiProcessing
    ReadingService capability we need: keep the accelerator fed)."""

    def __init__(self, stream: Iterator, depth: int = 2,
                 transfer: Optional[Callable] = None):
        self._q: queuelib.Queue = queuelib.Queue(maxsize=depth)
        self._stream = stream
        self._transfer = transfer
        self._done = object()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for item in self._stream:
                if self._transfer:
                    item = self._transfer(item)
                self._q.put(item)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item


def quality_filter(sample: Dict[str, Any],
                   min_resolution: int = 128,
                   max_aspect_ratio: float = 3.0,
                   min_similarity: Optional[float] = None,
                   min_caption_len: int = 1,
                   max_caption_len: int = 512) -> bool:
    """Qwen-style data quality filters (torchdata_preprocess.py:174-237):
    resolution / aspect-ratio / CLIP-similarity / caption-length gates.
    Returns True if the sample passes."""
    img = sample.get("image")
    if img is not None:
        w, h = img.size if hasattr(img, "size") else (img.shape[1], img.shape[0])
        if min(w, h) < min_resolution:
            return False
        if max(w, h) / max(1, min(w, h)) > max_aspect_ratio:
            return False
    text = sample.get("text")
    if text is not None:
        n_words = len(str(text).split())
        if not (min_caption_len <= n_words <= max_caption_len):
            return False
    if min_similarity is not None:
        sim = (sample.get("meta") or {}).get("similarity")
        if sim is not None and sim < min_similarity:
            return False
    return True


# ------------------------------ tar source ---------------------------------

def lmdb_ids_source(meta_path: str, lmdb_dir: str,
                    get_fn: Optional[Callable[[str], Optional[bytes]]] = None,
                    host_index: Optional[int] = None,
                    host_count: Optional[int] = None) -> Iterator[Dict]:
    """CC3M-style LMDB reader (MultiModalLLM/src/data/cc3m.py:15-47): a
    TSV meta file of ``caption<TAB>img_name`` rows plus an LMDB store
    mapping img_name -> pickled precomputed SEED image-token ids. Yields
    ``{"caption", "image_ids"}`` records for
    :func:`seed_tpu.data.builders.build_caption_example` (the reference
    dataset inlines the same BOI/ids/EOI + reverse_ratio assembly its
    torchdata pipes use — here one builder serves both sources).

    Rows whose key is missing from the store are skipped (the reference
    collates them out, cc3m.py:78-80). ``get_fn`` overrides the LMDB
    lookup (tests / alternative stores); without it the ``lmdb`` package
    is required. Rows are sharded per host like every other source."""
    if get_fn is None:
        try:
            import lmdb
        except ImportError as e:          # pragma: no cover
            raise ImportError(
                "lmdb_ids_source needs the 'lmdb' package (or pass "
                "get_fn=) — not bundled in this environment") from e
        env = lmdb.open(lmdb_dir, readonly=True, max_readers=1024,
                        create=False, lock=False)
        txn = env.begin(buffers=False)
        get_fn = lambda k: txn.get(k.encode("utf-8"))
    if host_index is None:
        import jax
        host_index, host_count = jax.process_index(), jax.process_count()
    hi, hc = host_index, host_count or 1
    with open(meta_path) as f:
        for lineno, line in enumerate(f):
            if lineno % hc != hi:
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            caption, img_name = parts[0], parts[1]
            raw = get_fn(img_name)
            if raw is None:
                continue
            yield {"caption": caption,
                   "image_ids": list(pickle.loads(raw))}


def tar_source(pattern: str, decode: Callable = decode_pkl_records,
               cycle_count: Optional[int] = 1, seed: int = 0,
               host_index: Optional[int] = None,
               host_count: Optional[int] = None) -> Iterator[Dict]:
    """files -> per-host shard -> cycle -> tar -> group -> decode -> filter."""
    files = shard_for_host(list_shards(pattern), host_index, host_count)
    for path in cycle(files, cycle_count, seed):
        for sample in group_by_key(iter_tar(path)):
            rec = decode(sample)
            if rec is not None:
                yield rec
