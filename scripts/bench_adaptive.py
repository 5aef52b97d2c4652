"""A/B the adaptive-confidence RANSAC early exit on the real chip.

Three comparisons (VERDICT r4 item 1):
  1. multi-homography accept-realistic (trained accept weights, related
     pairs): fixed 50k vs adaptive cap-50k/chunk-4096 — the typical case.
  2. multi-homography 3-homography fp32 (untrained, exhausts 3 slots):
     fixed vs adaptive — the adversarial case (low inlier ratios may
     prevent early exit; measures worst-case overhead of the while_loop).
  3. headline serving path (bf16/chunk2, 10k iters): fixed vs adaptive.

Usage:  timeout 1800 python scripts/bench_adaptive.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (sets the compilation-cache env vars)


def main():
    bench._probe_devices(300.0)
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import (
        init_resnet50_layer3, cast_params, load_params_npz,
    )
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import fused_align_batch, device_pyramid

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_f32 = init_alignment_params(jax.random.PRNGKey(1))
    accept_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "accept_weights.npz")
    accept = load_params_npz(accept_path)

    chunk = int(os.environ.get("ADAPTIVE_CHUNK", "4096"))

    print("== accept-realistic multihomo (trained weights, related pairs)")
    pps, avg_h = bench.bench_multihomo(resnet_f32, accept, related=True)
    print(f"  fixed 50k      : {pps:.2f} pairs/s  avg_h={avg_h:.2f}")
    pps_a, avg_h_a = bench.bench_multihomo(
        resnet_f32, accept, related=True, adaptive_chunk=chunk)
    print(f"  adaptive c{chunk}: {pps_a:.2f} pairs/s  avg_h={avg_h_a:.2f}")

    print("== 3-homography exhausted multihomo (untrained, fp32)")
    pps3, _ = bench.bench_multihomo(resnet_f32, align_f32, max_coarse=2)
    print(f"  fixed 50k      : {pps3:.2f} pairs/s")
    pps3_a, _ = bench.bench_multihomo(
        resnet_f32, align_f32, max_coarse=2, adaptive_chunk=chunk)
    print(f"  adaptive c{chunk}: {pps3_a:.2f} pairs/s")

    print("== headline serving (bf16/chunk2, 10k iters)")
    resnet = cast_params(resnet_f32, jnp.bfloat16)
    align = cast_params(align_f32, jnp.bfloat16)
    shapes = bench.pyramid_shapes()
    rng = np.random.RandomState(0)
    src_h, src_w = shapes[0]
    n = bench.N_PAIRS
    sources = jnp.asarray(rng.rand(n, 1, src_h, src_w, 3).astype(np.float32))
    targets = jnp.asarray(
        rng.rand(n, 1, bench.ASPECT[0], bench.ASPECT[1], 3).astype(np.float32))

    def build(srcs):
        return jax.vmap(lambda s: device_pyramid(s, shapes))(srcs)

    build_j = jax.jit(build)

    def run(k, ac):
        pyr = build_j(sources)
        out = fused_align_batch(
            resnet, align, pyr, targets, jax.random.split(k, n),
            n_iter=bench.N_ITER, batch_mode="chunk2", adaptive_chunk=ac)
        return np.asarray(out["num_inliers"])

    for ac in (0, 2048):
        run(jax.random.PRNGKey(3), ac)
        el = float("inf")
        for s in (4, 5, 6):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(s), ac)
            el = min(el, time.perf_counter() - t0)
        label = "fixed 10k" if ac == 0 else f"adaptive c{ac}"
        print(f"  {label}: {n / el:.2f} pairs/s")


if __name__ == "__main__":
    main()
