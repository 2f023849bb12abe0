"""Tracing / profiling / observability.

The reference has none of this beyond tqdm bars and TensorBoard scalars for
the 5 loss terms and test R@k (reference train_test.py:279-285, 446-450).
This module supplies the TPU-native equivalents called for by SURVEY.md §5:

  * ScalarWriter   — TensorBoard scalars (same tag set as the reference)
    with a JSONL fallback when TensorBoard isn't importable;
  * StepTimer      — per-step wall-clock ring buffer -> img/s percentiles
    (the reference's only timing is eyeballing tqdm);
  * StepProfiler   — jax.profiler trace window over a configurable step
    range, producing a TensorBoard-viewable XLA trace.

All three are no-ops when disabled so the train loop carries zero overhead
in production runs that don't ask for them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class ScalarWriter:
    """TensorBoard scalar writer with a JSONL fallback.

    Mirrors the reference's SummaryWriter usage (train_test.py:279-285):
    one add_scalar per loss term per print_freq step and test R@k per
    epoch.  When the tensorboard package is unavailable the same scalars
    land in ``<logdir>/scalars.jsonl`` (one JSON object per line).
    """

    def __init__(self, logdir: Optional[str], enabled: bool = True):
        self._tb = None
        self._jsonl = None
        if not enabled or not logdir:
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def scalar(self, tag: str, value, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step)})
                + "\n")
            self._jsonl.flush()

    def scalars(self, values: Dict[str, float], step: int,
                prefix: str = ""):
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


class StepTimer:
    """Per-step wall-clock ring buffer.

    ``tick()`` marks a step boundary and returns the elapsed seconds since
    the previous one (None on the first call).  ``summary(items_per_step)``
    reports mean / p50 / p90 latency and throughput over the retained
    window, skipping the first ``warmup`` steps (jit compilation).
    """

    def __init__(self, window: int = 512, warmup: int = 2):
        self.window = window
        self.warmup = warmup
        self._times = []
        self._seen = 0
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._seen += 1
            if self._seen > self.warmup:
                self._times.append(dt)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now
        return dt

    def summary(self, items_per_step: float = 1.0) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "step_ms_mean": float(t.mean() * 1e3),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p90": float(np.percentile(t, 90) * 1e3),
            "throughput": float(items_per_step / t.mean()),
        }


class StepProfiler:
    """jax.profiler trace over steps [start, start + num) (inclusive of
    compile if start==0; pick start >= 2 to profile steady state).

    Produces a trace dir viewable with TensorBoard's profile plugin or
    xprof.  Disabled when logdir is empty or start < 0.
    """

    def __init__(self, logdir: str = "", start: int = -1, num: int = 5):
        self.logdir = logdir
        self.start = start if logdir else -1
        self.stop = start + num
        self._active = False

    def step(self, step_idx: int):
        """Call once per train step with the global step index."""
        if self.start < 0:
            return
        if step_idx == self.start and not self._active:
            import jax
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step_idx >= self.stop and self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
