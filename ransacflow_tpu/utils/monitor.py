"""Metrics logging + profiling hooks.

The reference's observability is stdout prints plus a disabled Visdom
logger (utils/monitor.py:20-37, train/train.py:23). Here: a JSONL metrics
logger (machine-readable, append-only), stdout summaries, per-stage wall
timers, and JAX profiler trace capture for TPU performance work.
"""

import contextlib
import json
import os
import time


class MetricsLogger:
    """Append metrics dicts to <out_dir>/metrics.jsonl and echo to stdout."""

    def __init__(self, out_dir, echo=True):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self.echo = echo

    def log(self, step, **metrics):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.echo:
            parts = ", ".join(f"{k} {v:.6f}" for k, v in metrics.items())
            print(f"[step {step}] {parts}", flush=True)


class StageTimer:
    """Accumulate wall time per named stage; `report()` prints a summary."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def time(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name}: total {total:.3f}s, {n} calls, "
                f"{total / n * 1000:.1f} ms/call"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir, enabled=True):
    """Capture a JAX profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
