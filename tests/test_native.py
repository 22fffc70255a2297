"""Native (C++) tar loader + JPEG decoder, vs Python tarfile/PIL oracles."""
import io
import os
import tarfile

import numpy as np
import pytest

from seed_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native tarloader unavailable (no toolchain/libjpeg)")
    return True


def make_tar(path, items):
    with tarfile.open(path, "w") as tf:
        for name, data in items:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def jpeg_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


class TestTarIndex:
    def test_index_matches_tarfile(self, lib_ok, tmp_path):
        p = str(tmp_path / "a.tar")
        items = [(f"k{i}.bin", os.urandom(100 + 37 * i)) for i in range(5)]
        make_tar(p, items)
        idx = native.tar_index(p)
        assert [n for n, _, _ in idx] == [n for n, _ in items]
        # offsets/sizes must round-trip the payloads
        raw = native.tar_read_batch(p, [(off, sz) for _, off, sz in idx])
        for (name, data), got in zip(items, raw):
            assert got == data

    def test_corrupt_tar_raises_not_crashes(self, lib_ok, tmp_path):
        p = str(tmp_path / "bad.tar")
        # write garbage that still looks header-like enough to terminate
        open(p, "wb").write(b"\0" * 1024)
        idx = native.tar_index(p)
        assert idx == []


class TestJpegDecode:
    def test_decode_matches_pil_within_tolerance(self, lib_ok):
        rng = np.random.RandomState(0)
        # smooth image so jpeg loss is small
        base = rng.rand(8, 8, 3)
        from PIL import Image
        img = np.asarray(Image.fromarray(
            (base * 255).astype(np.uint8)).resize((64, 64)), np.uint8)
        data = jpeg_bytes(img)
        out, ok = native.jpeg_decode_resize([data, data], 32, 32)
        assert ok.all()
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                         .resize((32, 32)), np.float32)
        diff = np.abs(out[0].astype(np.float32) - pil).mean()
        assert diff < 12.0, diff   # resampling kernels differ; means close

    def test_invalid_jpeg_flagged_not_fatal(self, lib_ok):
        good = jpeg_bytes(np.zeros((32, 32, 3), np.uint8))
        out, ok = native.jpeg_decode_resize([b"not a jpeg", good], 16, 16)
        assert not ok[0] and ok[1]

    def test_fast_image_batches_end_to_end(self, lib_ok, tmp_path):
        p = str(tmp_path / "imgs.tar")
        rng = np.random.RandomState(0)
        items = []
        for i in range(6):
            arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            items.append((f"s{i}.jpg", jpeg_bytes(arr)))
            items.append((f"s{i}.txt", f"caption {i}".encode()))
        make_tar(p, items)
        batches = list(native.fast_image_batches([p], batch_size=4,
                                                 image_size=28))
        n = sum(b[0].shape[0] for b in batches)
        assert n == 6
        imgs, keys, texts = batches[0]
        assert imgs.shape[1:] == (28, 28, 3)
        assert texts[0].startswith("caption")
