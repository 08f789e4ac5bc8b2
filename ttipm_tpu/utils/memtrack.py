"""Peak-RSS tracking (including children), the reference's memory metric.

Parity: /root/reference/src/utils.py:292-297 wraps the solve in
``memory_profiler.memory_usage(max_usage=True, include_children=True)``.
memory_profiler is not in this image; psutil is, so this module samples
RSS of the process tree from a daemon thread at a fixed interval and
reports the peak delta in MB.

Device-buffer stats (utils/runner._device_peak_mem_mb) remain the right
metric for on-chip memory; this tracker is the host-side complement and
the only meaningful number on the CPU backend.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Tuple, TypeVar

import psutil

__all__ = ["PeakRSSTracker", "measure_peak_rss"]

T = TypeVar("T")


def _tree_rss_bytes(proc: psutil.Process) -> int:
    total = proc.memory_info().rss
    try:
        for child in proc.children(recursive=True):
            try:
                total += child.memory_info().rss
            except (psutil.NoSuchProcess, psutil.AccessDenied):
                pass
    except (psutil.NoSuchProcess, psutil.AccessDenied):
        pass
    return total


class PeakRSSTracker:
    """Samples process-tree RSS from a daemon thread; ``peak_mb`` holds the
    running maximum.  Use as a context manager around the solve."""

    def __init__(self, interval_s: float = 0.1):
        self.interval_s = interval_s
        self.peak_bytes = 0
        self.baseline_bytes = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._proc = psutil.Process()

    def _run(self) -> None:
        while not self._stop.is_set():
            self.peak_bytes = max(self.peak_bytes, _tree_rss_bytes(self._proc))
            self._stop.wait(self.interval_s)

    def __enter__(self) -> "PeakRSSTracker":
        self.baseline_bytes = _tree_rss_bytes(self._proc)
        self.peak_bytes = self.baseline_bytes
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self.peak_bytes = max(self.peak_bytes, _tree_rss_bytes(self._proc))

    @property
    def peak_mb(self) -> float:
        """Peak RSS (MB) of the process tree during the tracked region."""
        return self.peak_bytes / 1e6

    @property
    def peak_delta_mb(self) -> float:
        """Peak RSS increase over the baseline at __enter__ (MB) — the
        reference's reported quantity (RSS delta over the solve)."""
        return max(0.0, (self.peak_bytes - self.baseline_bytes) / 1e6)


def measure_peak_rss(fn: Callable[[], T],
                     interval_s: float = 0.1) -> Tuple[float, T]:
    """Run ``fn`` under RSS tracking; returns (peak_delta_mb, result)."""
    with PeakRSSTracker(interval_s) as tracker:
        result = fn()
    return tracker.peak_delta_mb, result
