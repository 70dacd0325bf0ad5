"""Training logger: stream + file + JSONL per-iteration records.

Capability parity with the reference observability (SURVEY.md §5): the bare
python logger of main_pretrain.py:91-102 and mmengine's LoggerHook JSONL
(time/data_time/memory per iteration, the source of all published timing
baselines), plus optional jax profiler trace capture.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional


def make_logger(name: str = "mtp_tpu", log_file: Optional[str] = None
                ) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class JsonlLogger:
    """Per-iteration JSONL records: {iter, lr?, time, data_time, **metrics}."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.f = open(path, "a")
        self._last = time.perf_counter()
        self._data_time = 0.0

    def data_tick(self):
        """Call after fetching a batch (accumulates host data time)."""
        now = time.perf_counter()
        self._data_time = now - self._last

    @staticmethod
    def device_memory_mb():
        """HBM bytes in use on device 0 (the reference logs 'memory' MB per
        iter); None where the backend exposes no stats (CPU)."""
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_in_use" in stats:
                return round(stats["bytes_in_use"] / 2**20)
        except Exception:
            pass
        return None

    def log(self, step: int, metrics: Dict[str, float], **extra):
        now = time.perf_counter()
        rec = {"iter": step, "time": round(now - self._last, 4),
               "data_time": round(self._data_time, 4)}
        mem = self.device_memory_mb()
        if mem is not None:
            rec["memory"] = mem
        rec.update({k: (round(float(v), 6) if isinstance(v, (int, float)) else v)
                    for k, v in metrics.items()})
        rec.update(extra)
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        self._last = now

    def close(self):
        self.f.close()


class Profiler:
    """jax profiler wrapper: capture a trace for N steps into a TensorBoard-
    compatible directory (the reference has no profiler at all)."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        self.active = False

    def start(self):
        import jax
        jax.profiler.start_trace(self.logdir)
        self.active = True

    def stop(self):
        import jax
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
