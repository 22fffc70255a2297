"""End-to-end smoke tests of the CLI entry points (subprocesses, CPU)."""
import io
import json
import os
import pickle
import subprocess
import sys
import tarfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon site dir importable but force the cpu backend
    return subprocess.run([sys.executable] + cmd, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True, env=env)


def write_pkl_tar(path, n=32, with_qa=False):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            rec = {"image_ids": list(np.random.RandomState(i).randint(0, 64, 8)),
                   "text": f"a photo number {i}"}
            if with_qa:
                rec.update(question=f"what is {i}?", answer=f"thing {i}")
            data = pickle.dumps(rec)
            info = tarfile.TarInfo(f"k{i}.pkl")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def write_img_tar(path, n=6, size=28):
    from PIL import Image
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (size, size, 3),
                                                 dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"k{i}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption {i}".encode()
            info = tarfile.TarInfo(f"k{i}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


@pytest.mark.slow
def test_train_llm_pretrain_smoke(tmp_path):
    shard = tmp_path / "data_000.tar"
    write_pkl_tar(str(shard))
    r = run(["scripts/train_llm.py", "--data", str(tmp_path / "data_*.tar"),
             "--model", "tiny", "--steps", "3", "--batch-size", "4",
             "--max-length", "64", "--save-steps", "3", "--log-steps", "1",
             "--output", str(tmp_path / "out")])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "training done" in r.stdout
    assert (tmp_path / "out" / "step_3").exists()


@pytest.mark.slow
def test_train_tokenizer_stage1_smoke(tmp_path):
    shard = tmp_path / "img_000.tar"
    write_img_tar(str(shard))
    r = run(["scripts/train_tokenizer.py", "--stage", "1", "--arch", "tiny",
             "--data", str(tmp_path / "img_*.tar"),
             "--steps", "2", "--batch-size", "4",
             "--save-steps", "2", "--output", str(tmp_path / "out1")])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "training done" in r.stdout


@pytest.mark.slow
def test_extract_image_ids_smoke(tmp_path):
    shard = tmp_path / "img_000.tar"
    write_img_tar(str(shard), n=5)
    out = tmp_path / "ids"
    r = run(["scripts/extract_image_ids.py", "--input",
             str(tmp_path / "img_*.tar"), "--output", str(out),
             "--batch-size", "4"])
    assert r.returncode == 0, r.stderr[-3000:]
    tars = list(out.glob("*.tar"))
    assert tars
    with tarfile.open(tars[0]) as tf:
        names = tf.getnames()
        rec = pickle.loads(tf.extractfile(names[0]).read())
    assert len(rec["image_ids"]) == 32
    assert all(0 <= i < 8192 for i in rec["image_ids"])
