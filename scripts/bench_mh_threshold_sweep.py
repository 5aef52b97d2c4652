"""Accept-threshold sensitivity of the multi-homography loop, fp32 vs bf16
(VERDICT r4 item 9).

Round 4 measured a BEHAVIORAL dtype effect: with trained accept weights on
related pairs, the bf16 loop exits after ~1.4 homographies where fp32 takes
~2.1 — bf16 matchability saturates slightly differently, so the
newly-matched-area fraction crosses mask_region_th (reference default 0.01,
evaluation/evalHpatch/evaluation.py:75) on a different iteration. Before
serving can default to bf16 on the eval path, quantify how sensitive the
exit point is to the threshold under each dtype.

For each dtype x mask_region_th, runs the accept-realistic batched fused
loop (bench.bench_multihomo related=True, trained accept weights) and
records avg homographies accepted + pairs/s. The table goes to
docs/PERFORMANCE.md; the chosen policy is pinned by a test.

Usage: timeout 2400 python scripts/bench_mh_threshold_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (sets compilation-cache env vars)


def main():
    bench._probe_devices(300.0)
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import (
        init_resnet50_layer3, cast_params, load_params_npz,
    )

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    accept_f32 = load_params_npz(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "accept_weights.npz"))
    resnet_bf16 = cast_params(resnet_f32, jnp.bfloat16)
    accept_bf16 = cast_params(accept_f32, jnp.bfloat16)

    ths = [float(t) for t in os.environ.get(
        "SWEEP_THS", "0.005,0.01,0.02,0.05").split(",")]
    n_iter = int(os.environ.get("SWEEP_N_ITER", "50000"))

    rows = []
    for dtype, rp, ap in (("float32", resnet_f32, accept_f32),
                          ("bfloat16", resnet_bf16, accept_bf16)):
        for th in ths:
            pps, avg_h = bench.bench_multihomo(
                rp, ap, related=True, mask_region_th=th, n_iter=n_iter)
            rows.append((dtype, th, avg_h, pps))
            print(f"{dtype:8s} th={th:<6g} avg_h={avg_h:5.2f} "
                  f"pairs/s={pps:6.2f}", flush=True)

    print("\n| dtype | mask_region_th | avg homographies | pairs/s |")
    print("|---|---|---|---|")
    for dtype, th, avg_h, pps in rows:
        print(f"| {dtype} | {th:g} | {avg_h:.2f} | {pps:.1f} |")


if __name__ == "__main__":
    main()
