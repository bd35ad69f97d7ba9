"""Training telemetry: smoothed stats, scalar logging, profiler hooks,
NaN tripwire.

TPU-native rebuild of the reference observability layer:
  * `TrainingStats` (median-smoothed loss windows + ETA,
    `LeReS Train/lib/utils/training_stats.py:19-100`) -> TrainingStats
  * `SmoothedValue` (`Train/lib/utils/logging.py:16-36`) -> SmoothedValue
  * TensorBoard scalars (`ngp_pl/train.py:164-168` self.log surface) ->
    ScalarLogger writes JSONL always and TensorBoard when tensorboardX is
    importable (this image has none — JSONL is the durable record)
  * profiling: the reference only wall-clocks (`ngp_pl/test.py:32-36`);
    here `profile_trace` wraps a step range in a `jax.profiler` trace
    (SURVEY.md §5.1 commitment)
  * `debug_mode` enables the reference's detect_anomaly analog
    (`Train/tools/train.py:267`): jax_debug_nans (SURVEY.md §5.2)
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Any, Dict, Optional


class SmoothedValue:
    """Window-median/average tracker (`logging.py:16-36`)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.series = []
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        v = float(value)
        self.deque.append(v)
        self.series.append(v)
        self.count += 1
        self.total += v

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class ScalarLogger:
    """JSONL + optional TensorBoard scalar sink."""

    def __init__(self, log_dir: Optional[str] = None, rank: int = 0):
        self.rank = rank
        self.jsonl = None
        self.tb = None
        if log_dir and rank == 0:
            os.makedirs(log_dir, exist_ok=True)
            self.jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(log_dir)
            except ImportError:
                self.tb = None

    def log(self, step: int, scalars: Dict[str, Any]):
        if self.rank != 0:
            return
        if self.jsonl is not None:
            rec = {"step": int(step),
                   **{k: float(v) for k, v in scalars.items()},
                   "time": time.time()}
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class TrainingStats:
    """Median-smoothed per-key stats with ETA (`training_stats.py:19-100`)."""

    def __init__(self, total_iters: int, log_interval: int = 10,
                 logger: Optional[ScalarLogger] = None, window: int = 20):
        self.total_iters = total_iters
        self.log_interval = log_interval
        self.logger = logger
        self.smoothed: Dict[str, SmoothedValue] = {}
        self.window = window
        self.iter_start = None
        self.iter_time = SmoothedValue(window)

    def iter_tic(self):
        self.iter_start = time.time()

    def iter_toc(self):
        if self.iter_start is not None:
            self.iter_time.update(time.time() - self.iter_start)

    def update(self, scalars: Dict[str, Any]):
        for k, v in scalars.items():
            self.smoothed.setdefault(
                k, SmoothedValue(self.window)).update(float(v))

    def eta_seconds(self, cur_iter: int) -> float:
        return self.iter_time.median * max(self.total_iters - cur_iter, 0)

    def log_iter_stats(self, cur_iter: int, extra: Optional[Dict] = None,
                       print_fn=print):
        if cur_iter % self.log_interval:
            return
        stats = {k: v.median for k, v in self.smoothed.items()}
        if extra:
            stats.update(extra)
        eta = self.eta_seconds(cur_iter)
        msg = f"[iter {cur_iter}/{self.total_iters} eta {eta:7.0f}s] " + \
            " ".join(f"{k}={v:.4g}" for k, v in stats.items())
        print_fn(msg)
        if self.logger is not None:
            self.logger.log(cur_iter, stats)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context; open the output in XProf/TensorBoard."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named profiler annotation for one step (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def debug_mode(nans: bool = True):
    """Enable the NaN tripwire (reference detect_anomaly analog)."""
    import jax
    jax.config.update("jax_debug_nans", bool(nans))
