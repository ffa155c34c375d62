"""Tracing / profiling / observability.

The reference has none of this (SURVEY.md section 5: tqdm bars and step-500
prints only, reference kgwas/kgwas.py:129,153-155). Here:
  * jax.profiler trace capture around training windows (TensorBoard format)
  * per-step edges/s + epoch-time counters (the north-star metrics)
  * structured JSONL metrics log, wandb-compatible dicts
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (open with TensorBoard / xprof) around the
    enclosed block. No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Counts edge traversals (edges x layers per full-graph step)."""

    edges_per_step: int
    log_path: Optional[str] = None
    history: list = field(default_factory=list)
    _t0: float = 0.0
    _steps: int = 0

    def start_epoch(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self):
        self._steps += 1

    def end_epoch(self, epoch: int, extra: Optional[dict] = None) -> dict:
        dt = time.perf_counter() - self._t0
        rec = {
            "epoch": epoch,
            "steps": self._steps,
            "epoch_time_s": dt,
            "edges_per_sec": (self.edges_per_step * self._steps / dt)
            if dt > 0
            else 0.0,
        }
        if extra:
            rec.update(extra)
        self.history.append(rec)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec
