"""Training observability: smoothed meters, JSON-lines logs, profiler.

Rebuilds the LAVIS logging layer (lavis/common/logger.py MetricLogger /
SmoothedValue with cross-process sync, runner_base.py:681-692 log.txt
JSON lines) plus what the reference lacks (SURVEY.md §5): jax.profiler
trace capture around training steps and per-step wall-clock timing.
"""
from __future__ import annotations

import collections
import contextlib
import json
import os
import time
from typing import Dict, Iterable, Optional

import numpy as np


def build_logger(logger_name: str, logger_dir: str):
    """Serving/demo logger with a daily-rotating file shared by all loggers
    (gradio_demo/utils.py:10-49 build_logger): one
    TimedRotatingFileHandler(when='D', utc=True) per process, attached to
    the root so every module's records land in the same file."""
    import logging
    import logging.handlers
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    root = logging.getLogger()
    if not root.handlers:
        logging.basicConfig(level=logging.INFO)
    root.handlers[0].setFormatter(formatter)
    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    if not any(isinstance(h, logging.handlers.TimedRotatingFileHandler)
               for h in root.handlers):
        os.makedirs(logger_dir, exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(logger_dir, logger_name + ".log"),
            when="D", utc=True)
        fh.setFormatter(formatter)
        root.addHandler(fh)
    return logger


class SmoothedValue:
    """Windowed median/avg meter (logger.py SmoothedValue)."""

    def __init__(self, window: int = 20):
        self.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(float(value))
        self.total += float(value) * n
        self.count += n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(1, self.count)

    def synchronize_between_processes(self):
        """all-reduce (count, total) over hosts — psum on a scalar array."""
        import jax
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        arr = np.asarray([self.count, self.total], np.float64)
        arr = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count, self.total = int(arr[0]), float(arr[1])


class MetricLogger:
    def __init__(self, delimiter: str = "  ", window: int = 20,
                 log_file: Optional[str] = None):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(
            lambda: SmoothedValue(window))
        self.delimiter = delimiter
        self.log_file = log_file

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {m.median:.4f} ({m.global_avg:.4f})"
            for name, m in self.meters.items())

    def write_json_line(self, **extra):
        """Append a log.txt-style JSON line (runner_base.py:681-692)."""
        if not self.log_file:
            return
        rec = {k: m.global_avg for k, m in self.meters.items()}
        rec.update(extra)
        os.makedirs(os.path.dirname(self.log_file) or ".", exist_ok=True)
        with open(self.log_file, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        """Wrap an iterable with periodic smoothed-metric prints."""
        start = time.time()
        step_t = SmoothedValue(print_freq)
        last = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            now = time.time()
            step_t.update(now - last)
            last = now
            if i % print_freq == 0 or (total and i == total - 1):
                eta = (total - i) * step_t.global_avg if total else float("nan")
                print(f"{header} [{i}{'/' + str(total) if total else ''}] "
                      f"eta {eta:.0f}s  t/step {step_t.median:.3f}s  {self}",
                      flush=True)
        print(f"{header} done in {time.time() - start:.1f}s", flush=True)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context: view in TensorBoard / xprof."""
    import jax
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Device-synchronized step timing (transfers a scalar to the host —
    the only reliable sync on the axon tunnel, see bench.py)."""

    def __init__(self):
        self.t0 = None

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        if sync_array is not None:
            np.asarray(sync_array)
        return time.perf_counter() - self.t0
