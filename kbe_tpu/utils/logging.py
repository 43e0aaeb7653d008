"""Observability: TensorBoard metrics, per-stage timing, profiler traces.

The reference's only observability is a TensorBoard SummaryWriter with
auto-incrementing run dirs (CustomWriter, utils/utils.py:44-58) and tqdm
bars. Here: the same auto-incrementing writer (via tensorboardX, with a
JSONL fallback when absent), a per-stage wall-clock timer that
block-until-ready's its section, and a jax.profiler trace context.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import time
from typing import Dict, Optional

import jax


def _next_run_dir(path: str) -> str:
    """Auto-increment trailing _<n> until the dir is free
    (CustomWriter semantics, utils/utils.py:46-54)."""
    while os.path.isdir(path):
        m = re.match(r"^(.*_)(\d+)/?$", path)
        if m:
            path = f"{m.group(1)}{int(m.group(2)) + 1}/"
        else:
            path = path.rstrip("/") + "_1/"
    return path


class MetricsWriter:
    """TensorBoard scalar writer with a JSONL fallback."""

    def __init__(self, logdir: str = "runs/train_0",
                 subdir: Optional[str] = None):
        logdir = _next_run_dir(logdir)
        if subdir is not None:
            logdir = os.path.join(logdir, subdir)
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps({"tag": tag, "value": value,
                                      "step": step}) + "\n")

    def scalars(self, values: Dict[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in values.items():
            self.scalar(prefix + k, v, step)

    def hparams(self, params: Dict) -> None:
        if self._tb is not None:
            try:
                self._tb.add_hparams(
                    {k: v for k, v in params.items()
                     if isinstance(v, (int, float, str, bool))}, {})
            except Exception:
                pass
        self._jsonl.write(json.dumps({"hparams": {
            k: v for k, v in params.items()
            if isinstance(v, (int, float, str, bool))}}) + "\n")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


class StageTimer:
    """Wall-clock timing per named stage; blocks on device work so numbers
    mean what they say."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
