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

    def log_image(self, step, name, tensor, kind="auto"):
        """Dump a monitoring image to <out_dir>/images/<name>_<step>.png.

        kind: 'auto' (tensor2image), 'flow' (HSV wheel via flow2image).
        The reference pushed these to Visdom (utils/monitor.py:39-56);
        files are the headless-TPU-pod equivalent.
        """
        from PIL import Image

        img = flow2image(tensor) if kind == "flow" else tensor2image(tensor)
        d = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{name}_{step}.png")
        Image.fromarray(img).save(path)
        return path


def tensor2image(tensor):
    """Tensor -> uint8 HWC image for visual monitoring (reference
    utils/monitor.py:5-17): PIL passes through; a 1-channel map gets a
    jet colormap (numpy reimplementation — no cv2 in this image); RGB is
    scaled to [0, 255]. Accepts (B, H, W, C) channels-last arrays (first
    element used) or (H, W[, C])."""
    import numpy as np

    if "PIL" in str(type(tensor)):
        return np.array(tensor)
    arr = np.asarray(tensor, np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 1:
        # jet colormap of (1 - x), matching cv2.applyColorMap(255 - x, JET)
        x = 1.0 - np.clip(arr[..., 0], 0.0, 1.0)
        r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
        g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
        b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
        arr = np.stack([r, g, b], axis=-1)
    return (255.0 * np.clip(arr, 0.0, 1.0)).astype(np.uint8)


def flow2image(flow):
    """(H, W, 2) normalized flow -> uint8 HSV-wheel visualization
    (direction = hue, magnitude = saturation)."""
    import colorsys

    import numpy as np

    f = np.asarray(flow, np.float32)
    if f.ndim == 4:
        f = f[0]
    mag = np.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2)
    ang = (np.arctan2(f[..., 1], f[..., 0]) + np.pi) / (2 * np.pi)
    sat = np.clip(mag / (np.percentile(mag, 99) + 1e-8), 0, 1)
    h6 = ang * 6.0
    k = np.floor(h6)
    fpart = h6 - k
    p = 1.0 - sat
    q = 1.0 - sat * fpart
    t = 1.0 - sat * (1.0 - fpart)
    one = np.ones_like(sat)
    lut = [
        (one, t, p), (q, one, p), (p, one, t),
        (p, q, one), (t, p, one), (one, p, q),
    ]
    rgb = np.zeros(f.shape[:2] + (3,), np.float32)
    for i in range(6):
        m = (k.astype(int) % 6) == i
        for c in range(3):
            rgb[..., c][m] = lut[i][c][m]
    return (rgb * 255).astype(np.uint8)


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
