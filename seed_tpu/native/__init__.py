"""ctypes bindings for the native data loader (tarloader.cpp).

Builds the shared library on first use (g++ baked into the image) and
caches it next to the source; every entry point degrades gracefully to the
pure-Python pipeline when the toolchain or libjpeg is unavailable, so the
framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("seed_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tarloader.cpp")
_SO = os.path.join(_HERE, "libtarloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


class _TarEntry(ctypes.Structure):
    _fields_ = [("offset", ctypes.c_int64), ("size", ctypes.c_int64),
                ("name", ctypes.c_char * 200)]


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO, "-ljpeg",
           "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception as e:
        log.warning("native tarloader build failed (%s); using Python path", e)
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.tar_index.restype = ctypes.c_int64
        lib.tar_index.argtypes = [ctypes.c_char_p, ctypes.POINTER(_TarEntry),
                                  ctypes.c_int64]
        lib.tar_read_batch.restype = ctypes.c_int
        lib.tar_read_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.jpeg_decode_resize_batch.restype = ctypes.c_int
        lib.jpeg_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int8),
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def tar_index(path: str, max_entries: int = 1 << 20
              ) -> List[Tuple[str, int, int]]:
    """[(name, offset, size)] for all regular files in an uncompressed tar."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native tarloader unavailable")
    buf = (_TarEntry * max_entries)()
    n = lib.tar_index(path.encode(), buf, max_entries)
    if n < 0:
        raise IOError(f"tar_index failed for {path}")
    return [(buf[i].name.decode(errors="replace"), buf[i].offset, buf[i].size)
            for i in range(n)]


def tar_read_batch(path: str, entries: Sequence[Tuple[int, int]]
                   ) -> List[bytes]:
    """Read [(offset, size)] members in one native call."""
    lib = get_lib()
    offsets = np.asarray([e[0] for e in entries], np.int64)
    sizes = np.asarray([e[1] for e in entries], np.int64)
    total = int(sizes.sum())
    dst = np.empty(total, np.uint8)
    rc = lib.tar_read_batch(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(entries), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"tar_read_batch failed rc={rc}")
    out, pos = [], 0
    for s in sizes:
        out.append(dst[pos:pos + int(s)].tobytes())
        pos += int(s)
    return out


def jpeg_decode_resize(jpegs: Sequence[bytes], out_h: int, out_w: int,
                       threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Batch JPEG decode+resize -> (images [N,H,W,3] u8, ok [N] bool)."""
    lib = get_lib()
    n = len(jpegs)
    sizes = np.asarray([len(j) for j in jpegs], np.int64)
    src = np.frombuffer(b"".join(jpegs), np.uint8)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.int8)
    threads = threads or min(os.cpu_count() or 4, 16)
    lib.jpeg_decode_resize_batch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out_h, out_w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), threads)
    return out, ok.astype(bool)


def fast_image_batches(paths: Sequence[str], batch_size: int, image_size: int,
                       suffixes=(".jpg", ".jpeg", ".png", ".webp")):
    """Native-path image pipeline: tar index -> batched reads -> parallel
    decode+resize. Yields (images [B,H,W,3] u8, keys, texts). PNG/WebP
    members fall back to PIL decode."""
    import io as _io
    pend_entries: List[Tuple[str, Tuple[int, int], str]] = []
    texts: dict = {}

    def flush(path, batch):
        names = [b[2] for b in batch]
        raw = tar_read_batch(path, [b[1] for b in batch])
        jpeg_items = [(i, r) for i, (r, nm) in enumerate(zip(raw, names))
                      if nm.lower().endswith((".jpg", ".jpeg"))]
        imgs = np.zeros((len(raw), image_size, image_size, 3), np.uint8)
        ok = np.zeros(len(raw), bool)
        if jpeg_items:
            dec, okj = jpeg_decode_resize([r for _, r in jpeg_items],
                                          image_size, image_size)
            for (i, _), d, o in zip(jpeg_items, dec, okj):
                imgs[i], ok[i] = d, o
        for i, (r, nm) in enumerate(zip(raw, names)):
            if not nm.lower().endswith((".jpg", ".jpeg")):
                try:
                    from PIL import Image
                    im = Image.open(_io.BytesIO(r)).convert("RGB") \
                        .resize((image_size, image_size))
                    imgs[i], ok[i] = np.asarray(im, np.uint8), True
                except Exception:
                    ok[i] = False
        keys = [nm.rsplit(".", 1)[0] for nm in names]
        good = np.where(ok)[0]
        return imgs[good], [keys[i] for i in good], \
            [texts.get(keys[i], "") for i in good]

    for path in paths:
        try:
            index = tar_index(path)
        except IOError:
            log.warning("skipping unreadable tar %s", path)
            continue
        # collect texts first (txt members), then stream image batches
        txt_entries = [(nm, off, sz) for nm, off, sz in index
                       if nm.lower().endswith(".txt")]
        if txt_entries:
            raws = tar_read_batch(path, [(off, sz) for _, off, sz in txt_entries])
            for (nm, _, _), r in zip(txt_entries, raws):
                texts[nm.rsplit(".", 1)[0]] = r.decode("utf-8", "replace")
        img_entries = [(nm, off, sz) for nm, off, sz in index
                       if nm.lower().endswith(tuple(suffixes))]
        for i in range(0, len(img_entries), batch_size):
            chunk = [(path, (off, sz), nm)
                     for nm, off, sz in img_entries[i:i + batch_size]]
            yield flush(path, chunk)
