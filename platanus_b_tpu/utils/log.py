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

    def report_device_memory(self) -> None:
        """Per-device HBM telemetry (jax memory_stats), the device-side
        analog of VmPeak."""
        try:
            import jax
            for d in jax.devices():
                stats = d.memory_stats() or {}
                used = stats.get("bytes_in_use", 0) / (1 << 30)
                peak = stats.get("peak_bytes_in_use", 0) / (1 << 30)
                lim = stats.get("bytes_limit", 0) / (1 << 30)
                self.info(f"#### DEVICE {d.id} ({d.platform}) #### "
                          f"in_use: {used:.3f} GiB, peak: {peak:.3f} GiB, "
                          f"limit: {lim:.3f} GiB")
        except Exception:
            pass

    @contextlib.contextmanager
    def profile(self, trace_dir: str | None):
        """JAX profiler scope: traces every device op into trace_dir for
        xprof/TensorBoard when set (enabled CLI-wide via the
        PLATANUS_B_TPU_PROFILE env var); no-op otherwise."""
        if not trace_dir:
            yield
            return
        import jax
        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
            self.info(f"JAX profiler trace written to {trace_dir}")


LOG = StageLogger()
