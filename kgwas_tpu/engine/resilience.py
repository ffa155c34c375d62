"""Failure detection + elastic recovery for the training engine.

The reference has no failure handling at all (a CUDA OOM or NCCL hiccup
kills the run, reference kgwas/kgwas.py:126-180); on TPU pods and relayed
single-chip environments (axon) the common failure modes are transient:
backend restarts, relay claim timeouts, preempted slices. This module
classifies exceptions into transient-vs-fatal and drives epoch-boundary
restart: `KGWAS.train(max_restarts=N)` snapshots (params, opt_state) via
orbax at each epoch end, and on a transient failure restores the latest
snapshot, re-uploads the graph arrays, and continues from the next epoch.

Classification is deliberately conservative: programming errors
(shape/type), OOM (RESOURCE_EXHAUSTED), and NaN guards are FATAL —
retrying those wastes accelerator time and hides bugs.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

# Status substrings that indicate the BACKEND (not the program) failed.
# INTERNAL: XLA/TPU runtime errors (the axon relay surfaces backend
# hiccups this way); UNAVAILABLE/DEADLINE_EXCEEDED/ABORTED/CANCELLED:
# transport-level failures; "claim"/"relay"/"tunnel": axon-specific.
_TRANSIENT_MARKERS = (
    "INTERNAL",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "claim",
    "relay",
    "tunnel",
    "remote_compile",
    "Socket closed",
    "connection reset",
)

# Markers that force FATAL even when a transient marker also matches
# (e.g. "INTERNAL: ... RESOURCE_EXHAUSTED while allocating").
_FATAL_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "INVALID_ARGUMENT",
    "out of memory",
)


def is_transient_backend_error(exc: BaseException) -> bool:
    """True when retrying the work has a chance of succeeding."""
    if isinstance(exc, (ConnectionError, TimeoutError, BrokenPipeError)):
        return True
    # jax runtime errors (jax.errors.JaxRuntimeError wraps
    # jaxlib XlaRuntimeError; both stringify with the grpc-style code)
    name = type(exc).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError", "RuntimeError",
                    "OSError"):
        return False
    msg = str(exc)
    if any(m.lower() in msg.lower() for m in _FATAL_MARKERS):
        return False
    return any(m.lower() in msg.lower() for m in _TRANSIENT_MARKERS)


@dataclass
class RetryPolicy:
    max_restarts: int = 3
    backoff_s: float = 5.0      # first wait; axon claims need cool-down
    backoff_mult: float = 2.0
    max_backoff_s: float = 120.0

    def wait(self, restart_idx: int) -> float:
        """Backoff duration before restart number `restart_idx` (1-based)."""
        return min(self.backoff_s * self.backoff_mult ** (restart_idx - 1),
                   self.max_backoff_s)


def sleep_backoff(policy: RetryPolicy, restart_idx: int, sleep=time.sleep):
    sleep(policy.wait(restart_idx))
