#!/usr/bin/env python
"""LLM-trainer convergence smoke on-chip (VERDICT r04 next #9).

Runs scripts/train_llm.py at a real-shape geometry (--model small: 0.4B,
full SEED vocabulary) through the REAL data path (pkl tar shards ->
build_caption_example -> shuffle -> collate -> Prefetcher), KILLS the
process mid-run, resumes with --resume, and verifies:

- the loss curve decreases (first-quarter mean vs last-quarter mean),
- the resumed run continues from the checkpointed step (no restart),
- sustained step/s through the real input pipeline.

    PYTHONPATH=/root/repo python scripts/smoke_train_llm.py \
        [--steps 200] [--kill-after 7] [--workdir /tmp/llm_smoke]
"""
import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_shards(root, n_shards=4, per_shard=512):
    import io
    import pickle
    import tarfile

    import numpy as np
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    words = ["a", "the", "red", "dog", "tree", "house", "running", "small",
             "river", "mountain", "blue", "cat", "garden", "flying", "old"]
    for s in range(n_shards):
        path = os.path.join(root, f"smoke_{s:03d}.tar")
        if os.path.exists(path):
            continue
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                cap = " ".join(rng.choice(words, rng.randint(4, 12)))
                rec = {"image_ids": rng.randint(0, 8192, 32).tolist(),
                       "text": cap}
                data = pickle.dumps(rec)
                info = tarfile.TarInfo(f"{s:03d}{i:05d}.pkl")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return os.path.join(root, "smoke_*.tar")


def run_phase(args_list, log_path, kill_after_logs=None):
    """Run train_llm.py, stream logs; optionally SIGKILL after N 'step'
    log lines (mid-run crash simulation). Returns captured lines."""
    lines = []
    with open(log_path, "a") as lf:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts/train_llm.py")]
            + args_list,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        n_steps_seen = 0
        for line in proc.stdout:
            lf.write(line)
            lf.flush()
            lines.append(line.rstrip())
            if line.startswith("step "):
                n_steps_seen += 1
                if kill_after_logs and n_steps_seen >= kill_after_logs:
                    proc.kill()          # hard kill: no cleanup
                    proc.wait()
                    return lines, True
        proc.wait()
        return lines, False


def parse(lines):
    steps = []
    for ln in lines:
        m = re.match(r"step (\d+): .*loss=([0-9.]+)", ln)
        if m:
            steps.append((int(m.group(1)), float(m.group(2))))
    return steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--kill-after", type=int, default=7,
                    help="kill after this many step-log lines")
    ap.add_argument("--workdir", default="/tmp/llm_smoke")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=512)
    ap.add_argument("--log-steps", type=int, default=10)
    args = ap.parse_args()

    shutil.rmtree(os.path.join(args.workdir, "ckpt"), ignore_errors=True)
    pattern = make_shards(os.path.join(args.workdir, "data"))
    out = os.path.join(args.workdir, "ckpt")
    log_path = os.path.join(args.workdir, "train.log")
    open(log_path, "w").close()

    common = ["--data", pattern, "--model", "small", "--mode", "pretrain",
              "--steps", str(args.steps), "--batch-size",
              str(args.batch_size), "--max-length", str(args.max_length),
              "--no-lora", "--warmup", "20", "--lr", "3e-4",
              "--save-steps", "50", "--log-steps", str(args.log_steps),
              "--output", out]

    t0 = time.perf_counter()
    lines1, killed = run_phase(common, log_path,
                               kill_after_logs=args.kill_after)
    assert killed, "phase 1 finished before the kill point; raise --steps"
    s1 = parse(lines1)
    print(f"phase1: killed after step {s1[-1][0]} "
          f"(loss {s1[-1][1]:.4f})", flush=True)

    lines2, _ = run_phase(common + ["--resume"], log_path)
    s2 = parse(lines2)
    resumed_at = next((int(m.group(1)) for ln in lines2
                       for m in [re.match(r"resumed from step (\d+)", ln)]
                       if m), None)
    wall = time.perf_counter() - t0

    all_steps = s1 + s2
    losses = [l for _, l in all_steps]
    q = max(1, len(losses) // 4)
    first_q, last_q = sum(losses[:q]) / q, sum(losses[-q:]) / q
    # sustained step/s: the LAST steps_per_sec the resumed phase logged
    # (amortizes its compile over the longest window; compile itself is
    # cached from phase 1)
    rates = [float(m.group(1)) for ln in lines2
             for m in [re.search(r"steps_per_sec=([0-9.]+)", ln)] if m]
    result = {
        "smoke": "train_llm_small",
        "steps_total": all_steps[-1][0] if all_steps else 0,
        "killed_at": s1[-1][0],
        "resumed_at": resumed_at,
        "loss_first_quarter": round(first_q, 4),
        "loss_last_quarter": round(last_q, 4),
        "loss_decreased": last_q < first_q,
        "resume_continued": (resumed_at is not None and resumed_at > 0
                             and resumed_at <= s1[-1][0] + 1),
        "wall_s": round(wall, 1),
        "steps_per_sec": round(rates[-1], 3) if rates else None,
        "ok": bool(last_q < first_q and resumed_at and all_steps
                   and all_steps[-1][0] >= args.steps),
    }
    print("smoke " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
