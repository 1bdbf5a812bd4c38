"""Training telemetry: moment accumulators + collector.

Rebuild of ref torch_utils/training_stats.py:25-160. The reference
accumulates (count, Σx, Σx²) per metric on-device and syncs across processes
with collectives; here stats flow out of the jitted step as a dict of
scalars (already psum-reduced by the sharded step), and the host-side
Collector keeps the same moment algebra for windowed mean/std.

Sinks mirror the reference (training_loop.py:383-498): console tick line,
stats.jsonl, and (if available) TensorBoard."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class Collector:
    """Windowed moment collector (ref training_stats.Collector :115-160)."""

    def __init__(self):
        self._moments: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        v = np.asarray(value, np.float64).reshape(-1)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        m = np.array([v.size, v.sum(), np.square(v).sum()])
        self._moments[name] = self._moments.get(name, np.zeros(3)) + m

    def update(self, stats: Dict[str, object]) -> None:
        for k, v in stats.items():
            self.report(k, np.asarray(v))

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] < 1:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def names(self):
        return sorted(self._moments)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"mean": self.mean(k), "std": self.std(k)} for k in self.names()}

    def reset(self) -> None:
        self._moments.clear()


class StatsLogger:
    """stats.jsonl + optional TensorBoard writer
    (ref training_loop.py:486-498)."""

    def __init__(self, run_dir: str):
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "stats.jsonl"), "at")
        self._tb = None
        try:
            from torch.utils import tensorboard

            self._tb = tensorboard.SummaryWriter(run_dir)
        except Exception:
            pass
        self._start = time.time()

    def log(self, collector: Collector, cur_nimg: int) -> None:
        entry = {k: v for k, v in collector.as_dict().items()}
        entry["Progress/kimg"] = {"mean": cur_nimg / 1e3, "std": 0.0}
        entry["timestamp"] = time.time()
        self._jsonl.write(json.dumps(entry) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            step = int(cur_nimg / 1e3)
            for name in collector.names():
                self._tb.add_scalar(name, collector.mean(name), global_step=step)
            self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
