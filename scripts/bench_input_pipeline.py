"""Host input-pipeline A/B: PIL vs the C++ Lanczos resampler (VERDICT r4
weak #4 / next-round item 6).

The train data pipeline (train/data.py PairFolder) decodes two jpgs and
runs trainTransform per pair: random min-side resize to one of
{crop, 1.5*crop, 2*crop} (the expensive step), same random crop + flip.
The native path (ransacflow_tpu/native/resize.cpp, ctypes) exists,
is tested, but was never wired because it was never measured — this
script decides wire-vs-retire on the 1-core train host.

Measures, over a synthetic on-disk dataset of MegaDepth-shaped jpgs:
  1. full PairFolder.epoch_batches throughput (decode + transform), PIL
     vs native, pairs/s;
  2. transform-only throughput (images pre-decoded), isolating the
     resize cost from the jpeg decode both share.

Usage: timeout 900 python scripts/bench_input_pipeline.py [--src 600 800]
"""

import argparse
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # never touch the tunnel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_dataset(root, n_groups, src_hw, rng):
    h, w = src_hw
    for g in range(n_groups):
        base = rng.rand(h // 8, w // 8, 3)
        for v in (1, 2):
            jit = np.clip(
                np.kron(base, np.ones((8, 8, 1))) + 0.05 * rng.rand(h, w, 3),
                0, 1)
            Image.fromarray((jit * 255).astype(np.uint8)).save(
                os.path.join(root, f"{g}_{v}.jpg"), quality=92)


def time_epochs(folder, batch_size, n_epochs):
    from ransacflow_tpu.train.data import prefetch

    n_pairs = 0
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        for batch in prefetch(folder.epoch_batches(batch_size)):
            n_pairs += batch["I1"].shape[0]
    return n_pairs / (time.perf_counter() - t0)


def time_transform_only(images, crop, use_native, n_iters, seed=0):
    from ransacflow_tpu.train.data import train_transform

    rng = np.random.RandomState(seed)
    t0 = time.perf_counter()
    for i in range(n_iters):
        i1, i2 = images[i % len(images)]
        train_transform(i1, i2, crop, rng, use_native=use_native)
    return n_iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=int, nargs=2, default=(600, 800),
                    help="source jpg H W (MegaDepth-shaped)")
    ap.add_argument("--groups", type=int, default=24)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()

    from ransacflow_tpu.native import native_available
    from ransacflow_tpu.train.data import PairFolder

    if not native_available():
        print("native resampler unavailable — nothing to A/B")
        return

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, args.groups, args.src, rng)

        results = {}
        for name, use_native in (("pil", False), ("native", True)):
            folder = PairFolder(root, img_size=args.crop, seed=1,
                                use_native=use_native)
            # warm once (builds/loads the .so on the native path)
            next(iter(folder.epoch_batches(args.batch)))
            results[name] = time_epochs(folder, args.batch, args.epochs)
            print(f"full pipeline [{name:6s}]: {results[name]:7.2f} pairs/s "
                  f"(decode+transform, B={args.batch})")

        imgs = []
        for g in range(args.groups):
            pair = tuple(
                Image.open(os.path.join(root, f"{g}_{v}.jpg")).convert("RGB")
                for v in (1, 2))
            imgs.append(pair)
        for name, use_native in (("pil", False), ("native", True)):
            pps = time_transform_only(imgs, args.crop, use_native, 96)
            print(f"transform only[{name:6s}]: {pps:7.2f} pairs/s")

        speedup = results["native"] / results["pil"]
        print(f"native/pil full-pipeline speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
