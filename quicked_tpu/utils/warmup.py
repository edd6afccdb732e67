"""Async device-kernel warmup: first-contact latency control.

The reference starts aligning instantly (zero compile); a device lane
that stalls the FIRST long-read call for tens of seconds of XLA
compilation (even a persistent-cache load through a remote tunnel) is
a product defect. This module lets the venue router serve a cold
bucket shape from the host C lane while a background thread compiles
and warms the device kernel for that shape; subsequent calls with the
same shape take the device as usual.

Semantics are venue-only: both lanes are bit-exact, so deferral can
never change results — only where the first batch of a given shape
executes. `QUICKED_TPU_ASYNC_WARMUP=0` disables deferral (cold calls
block on compilation, the pre-round-4 behavior).

One warmup worker thread: device warmups serialize (a single XLA
client compiles one program at a time anyway, and this environment's
TPU tunnel tolerates exactly one busy client).
"""

from __future__ import annotations

import os
import threading
import traceback

_LOCK = threading.Lock()
_WARMED: set = set()
_INFLIGHT: set = set()
_QUEUE: list = []
_WORKER: threading.Thread | None = None
_CV = threading.Condition(_LOCK)


def enabled() -> bool:
    return os.environ.get("QUICKED_TPU_ASYNC_WARMUP", "1") == "1"


def _worker_main() -> None:
    while True:
        with _CV:
            while not _QUEUE:
                _CV.wait()
            key, fn = _QUEUE.pop(0)
        try:
            fn()
        except Exception:  # a failed warmup must not kill the worker
            if os.environ.get("QUICKED_TPU_DEBUG"):
                traceback.print_exc()
        finally:
            with _CV:
                _INFLIGHT.discard(key)
                _WARMED.add(key)   # don't retry a failing shape forever;
                                   # the next real call runs it inline


def mark_warm(key) -> None:
    """Record that `key`'s kernel has executed (compiled) in-process."""
    with _CV:
        _WARMED.add(key)


def is_warm(key) -> bool:
    with _CV:
        return key in _WARMED


def defer_cold(key, warm_fn) -> bool:
    """True -> the caller should take its host fallback this time; the
    device kernel for `key` is being warmed in the background via
    `warm_fn` (called once, results discarded). False -> `key` is warm
    (or deferral is off): run on the device now."""
    if not enabled():
        return False
    global _WORKER
    with _CV:
        if key in _WARMED:
            return False
        if key not in _INFLIGHT:
            _INFLIGHT.add(key)
            _QUEUE.append((key, warm_fn))
            if _WORKER is None or not _WORKER.is_alive():
                _WORKER = threading.Thread(
                    target=_worker_main, name="quicked-warmup", daemon=True)
                _WORKER.start()
            _CV.notify()
        return True


def wait_idle(timeout: float = 120.0) -> bool:
    """Block until no warmups are queued or in flight (tests; also lets
    a benchmark separate 'cold + warming' from 'steady state')."""
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        with _CV:
            if not _QUEUE and not _INFLIGHT:
                return True
        time.sleep(0.01)
    return False


def reset() -> None:
    """Test hook: forget all warm/inflight state (queued fns still run)."""
    with _CV:
        _WARMED.clear()
        _INFLIGHT.clear()
