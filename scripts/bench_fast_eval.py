"""Composite fast-eval measurement on the real chip: the accept-realistic
50k-iteration multi-homography path with EVERY opt-in fast lever on at
once — bf16 compute (cast_params), adaptive-confidence RANSAC early exit
(chunk 4096), and anchor-stride feature banks (stride 3) — against the
fp32 fixed-iteration reference-parity point.

Each lever's consistency with the parity path is individually tested
(test_multi_homography_fused_bf16_consistent_with_fp32,
test_ransac_adaptive_distributional_parity,
test_fused_anchor_stride_pyramid / test_coarse_aligner_anchor_stride);
this harness attaches the composed speed number to those guarantees.
Measured 2026-08-19 (v5e single chip): fp32 fixed 21.0 pairs/s
(avg_h 2.12), bf16+adaptive 30.9 (avg_h 1.62), +anchor3 35.8 (avg_h
1.62 — identical exit dynamics to the exact-bank adaptive run).

Usage:  timeout 2400 python scripts/bench_fast_eval.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the compilation-cache env vars)


def main():
    bench._probe_devices(300.0)
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import (
        init_resnet50_layer3, cast_params, load_params_npz,
    )

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    accept = load_params_npz(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "accept_weights.npz"))
    resnet_bf16 = cast_params(resnet_f32, jnp.bfloat16)
    accept_bf16 = cast_params(accept, jnp.bfloat16)

    configs = [
        ("fp32 fixed (parity)", dict(), resnet_f32, accept),
        ("bf16 adaptive c4096", dict(adaptive_chunk=4096),
         resnet_bf16, accept_bf16),
        ("bf16 adaptive c4096 anchor3",
         dict(adaptive_chunk=4096, anchor_stride=3),
         resnet_bf16, accept_bf16),
    ]
    for name, kw, r, a in configs:
        pps, avg_h = bench.bench_multihomo(r, a, related=True, **kw)
        print(f"{name}: {pps:.2f} pairs/s  avg_h={avg_h:.2f}", flush=True)


if __name__ == "__main__":
    main()
