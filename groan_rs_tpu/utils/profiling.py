"""Pipeline profiling (SURVEY §5 tracing subsystem).

The reference has criterion micro-benches and a heartbeat printer only;
this rebuild adds first-class observability for the host->device pipeline:

- `PipelineProfiler`: per-stage wall-clock accounting (decode wait, host
  staging, H2D transfer, device compute) collected per batch and
  summarized; attach to `FrameEngine.run(profiler=...)`.
- `trace(dir)`: a context manager around `jax.profiler` emitting a
  TensorBoard-loadable device trace for the wrapped region.
"""

from __future__ import annotations

import contextlib
import time


class PipelineProfiler:
    """Accumulates per-stage timings of the trajectory pipeline."""

    STAGES = ("decode_wait", "h2d", "compute")

    def __init__(self):
        self.batches: list[dict] = []
        self._open: dict | None = None

    # ------------------------------------------------------------- recording
    def start_batch(self, n_frames: int):
        self._open = {"n_frames": int(n_frames)}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._open is not None:
                self._open[name] = self._open.get(name, 0.0) + (
                    time.perf_counter() - t0
                )

    def end_batch(self):
        if self._open is not None:
            self.batches.append(self._open)
            self._open = None

    # ------------------------------------------------------------- reporting
    def totals(self) -> dict:
        out = {s: 0.0 for s in self.STAGES}
        out["n_frames"] = 0
        for b in self.batches:
            out["n_frames"] += b.get("n_frames", 0)
            for s in self.STAGES:
                out[s] += b.get(s, 0.0)
        return out

    def medians(self) -> dict:
        """Per-stage per-batch medians (seconds).

        Medians are the trustworthy per-batch diagnostic on hosts with CPU
        steal: a single stolen window inflates one batch's stage by
        seconds and makes totals unrepresentative of the pipeline's
        structure (the r03 artifact recorded a 42 s 'compute' total inside
        a 1.1 s/pass run this way)."""
        import statistics

        out = {}
        for s in self.STAGES:
            vals = [b[s] for b in self.batches if s in b]
            out[s] = statistics.median(vals) if vals else 0.0
        out["n_batches"] = len(self.batches)
        return out

    def summary(self) -> str:
        t = self.totals()
        n = max(t["n_frames"], 1)
        parts = [f"{len(self.batches)} batches, {t['n_frames']} frames"]
        for s in self.STAGES:
            parts.append(f"{s}: {t[s]*1e3:.1f} ms ({t[s]/n*1e3:.2f} ms/frame)")
        return " | ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace for the wrapped region
    (view with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
