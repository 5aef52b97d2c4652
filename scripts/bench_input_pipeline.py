"""Input-pipeline throughput A/B: PIL vs the native C++ Lanczos resampler.

Measures host-side pairs/s of `PairFolder.epoch_batches` (JPEG decode +
random resize + crop + flip, the exact train transform) on synthetic
MegaDepth-shaped JPEGs, with `use_native` off/on. Decides VERDICT-r4
weak #4: whether `--nativeResize` should be the train default on the
1-core host or the native path gets demoted.

Usage: python scripts/bench_input_pipeline.py [--groups 48] [--img 224]
       [--src 672] [--batch 16] [--epochs 3]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_dataset(root, n_groups, src_size, rng):
    os.makedirs(root, exist_ok=True)
    h, w = src_size, int(src_size * 4 / 3) // 8 * 8
    for g in range(n_groups):
        for v in (1, 2):
            arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, f"{g}_{v}.jpg"), quality=92)


def run_epochs(folder, batch, epochs):
    from ransacflow_tpu.train.data import prefetch

    n_pairs = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in prefetch(folder.epoch_batches(batch)):
            n_pairs += b["I1"].shape[0]
    dt = time.perf_counter() - t0
    return n_pairs / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=48)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--src", type=int, default=672,
                    help="source JPEG min side (MegaDepth-resized scale)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from ransacflow_tpu.train.data import PairFolder
    from ransacflow_tpu.native import native_available

    root = tempfile.mkdtemp(prefix="bench_input_")
    make_dataset(root, args.groups, args.src, np.random.RandomState(0))
    print(f"dataset: {args.groups} groups, src min-side {args.src}, "
          f"crop {args.img}, batch {args.batch}")

    results = {}
    for use_native in (False, True):
        name = "native" if use_native else "pil"
        if use_native and not native_available():
            print("native resampler unavailable; skipping native leg")
            continue
        folder = PairFolder(root, img_size=args.img, seed=1,
                            use_native=use_native)
        run_epochs(folder, args.batch, 1)  # warm (page cache, lib build)
        pps, dt = run_epochs(folder, args.batch, args.epochs)
        results[name] = pps
        print(f"{name}: {pps:.1f} pairs/s host-side ({dt:.1f}s for "
              f"{args.epochs} epochs)")

    if len(results) == 2:
        r = results["native"] / results["pil"]
        print(f"native/pil speedup: {r:.2f}x")
        print('{"metric": "input_pipeline_native_speedup", '
              f'"value": {r:.3f}, "unit": "x", '
              f'"pil_pairs_s": {results["pil"]:.1f}, '
              f'"native_pairs_s": {results["native"]:.1f}}}')


if __name__ == "__main__":
    main()
