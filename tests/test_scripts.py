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
    # The axon sitecustomize overrides JAX_PLATFORMS at interpreter
    # startup, so the env var alone does NOT force CPU (verified: these
    # smoke subprocesses were silently running on the real TPU through
    # the tunnel). jax.config.update before first backend use wins —
    # same mechanism as tests/conftest.py — so wrap the script in runpy.
    shim = ("import os, sys; "
            # conftest exports the 8-virtual-device XLA_FLAGS; these are
            # single-device smoke tests (flags are read at backend init,
            # so scrubbing here is early enough)
            "os.environ.pop('XLA_FLAGS', None); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; sys.argv = sys.argv[1:]; "
            "runpy.run_path(sys.argv[0], run_name='__main__')")
    return subprocess.run([sys.executable, "-c", shim] + cmd, cwd=REPO,
                          timeout=timeout, capture_output=True, text=True)


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
def test_train_llm_resume_and_eval_smoke(tmp_path):
    """Kill/restart: run 2 steps + save, relaunch with --resume for 2
    more; the second process must start at step 2 and reach 4. In-loop
    caption eval runs at each save point (beam search, num_beams=2)."""
    shard = tmp_path / "data_000.tar"
    write_pkl_tar(str(shard))
    # tiny pretokenized eval prompts + annotations
    eval_data = tmp_path / "eval.jsonl"
    with open(eval_data, "w") as f:
        for i in range(4):
            f.write(json.dumps({"input_ids": [3 + i, 10, 20], "image_id": i})
                    + "\n")
    ann = tmp_path / "ann.json"
    with open(ann, "w") as f:
        json.dump({str(i): [f"caption {i}"] for i in range(4)}, f)
    common = ["scripts/train_llm.py", "--data", str(tmp_path / "data_*.tar"),
              "--model", "tiny", "--batch-size", "4",
              "--max-length", "64", "--save-steps", "2", "--log-steps", "1",
              "--eval-data", str(eval_data), "--eval-annotations", str(ann),
              "--eval-batch-size", "2", "--eval-max-new-tokens", "4",
              "--eval-num-beams", "2",
              "--output", str(tmp_path / "out")]
    r = run(common + ["--steps", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "eval_" in r.stdout       # eval metrics logged
    assert (tmp_path / "out" / "state" / "step_2").exists()
    r2 = run(common + ["--steps", "4", "--resume"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from step 2" in r2.stdout
    assert (tmp_path / "out" / "state" / "step_4").exists()
    assert (tmp_path / "out" / "best").exists()   # is_best tracking


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
def test_train_tokenizer_resume_and_eval_smoke(tmp_path):
    shard = tmp_path / "img_000.tar"
    write_img_tar(str(shard))
    common = ["scripts/train_tokenizer.py", "--stage", "1", "--arch", "tiny",
              "--data", str(tmp_path / "img_*.tar"),
              "--eval-data", str(tmp_path / "img_*.tar"),
              "--eval-batches", "1", "--batch-size", "4",
              "--save-steps", "2", "--output", str(tmp_path / "out1")]
    r = run(common + ["--steps", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "eval_loss" in r.stdout
    r2 = run(common + ["--steps", "4", "--resume"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from step 2" in r2.stdout
    assert (tmp_path / "out1" / "state" / "step_4").exists()
    assert (tmp_path / "out1" / "best").exists()


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


@pytest.mark.slow
def test_acceptance_synthetic_smoke(tmp_path):
    """The real-weight acceptance runbook dry-runs end-to-end with tiny
    synthetic weights: tokenizer parity vs the actual reference code,
    unCLIP structural checks, canonical prompts — and reports pass."""
    r = run(["scripts/acceptance.py", "--synthetic", "--out", str(tmp_path),
             "--max-images", "2", "--max-new-tokens", "8",
             "--diffusion-steps", "2"], timeout=580)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rep = json.load(open(tmp_path / "acceptance.json"))
    assert rep["pass"] is True
    st = rep["stages"]
    assert st["tokenizer_parity"]["status"] == "pass"
    assert st["tokenizer_parity"]["hard_mismatches"] == 0
    assert st["unclip_decode"]["status"] == "pass"
    assert st["canonical_prompts"]["status"] == "pass"
