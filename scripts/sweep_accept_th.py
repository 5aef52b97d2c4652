"""Accept-threshold sensitivity of the multi-homography loop: bf16 vs fp32.

Round 4 found a *behavioral* dtype effect: under bf16 the accept-realistic
multi-homography loop exits after ~1.4 homographies vs ~2.1 under fp32
(BENCH_r04.json) — the per-iteration accept test
``mean(match_fine * (1-mask)) > mask_region_th`` sits close to its
threshold, so matchability produced by bf16 convs crosses it differently.
This sweep quantifies that: for dtype in {float32, bfloat16} and
mask_region_th in a grid around the reference default 0.01
(evaluation/evalHpatch/evaluation.py:70-78), run the fused loop on
accept-realistic synthetic pairs with a KNOWN planted transform (target =
16px-rolled mid-scale source, bench.bench_multihomo(related=True)) and
report, per cell:

  - avg accepted homographies (exit dynamics)
  - coverage: fraction of valid pixels whose merged matchability clears
    the eval binarization threshold
  - EPE (px, target scale) of the merged flow vs the planted roll on the
    covered region

If bf16's earlier exit leaves coverage/EPE at fp32 levels, bf16 is safe as
the eval-path default; if coverage collapses, the policy stays fp32 (or a
compensated threshold). Results land in docs/PERFORMANCE.md.

Usage (TPU): python scripts/sweep_accept_th.py [--iters 50000] [--pairs 8]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402  (import-safe: main() guard)


def planted_truth(src_h, src_w, ht, wt):
    """Normalized source coords for each target pixel under the planted
    transform of bench_multihomo(related=True): target = roll(base, 16, 16),
    source = 2x-nearest-upsample(base)[:src_h,:src_w]. Base pixel (v,u)
    centers at source pixel (2v+0.5, 2u+0.5); target (y,x) is base
    (y-16, x-16). Returns (truth_nxy (ht,wt,2), valid (ht,wt)) — valid
    excludes the wrapped 16px band plus an 8px safety margin."""
    ys, xs = np.mgrid[0:ht, 0:wt]
    sx = 2.0 * (xs - 16) + 0.5
    sy = 2.0 * (ys - 16) + 0.5
    nx = 2.0 * sx / (src_w - 1) - 1.0
    ny = 2.0 * sy / (src_h - 1) - 1.0
    valid = (xs >= 24) & (ys >= 24) & (sx <= src_w - 1) & (sy <= src_h - 1)
    return np.stack([nx, ny], -1), valid


def quality(outs, src_h, src_w, ht, wt, bin_th):
    """Per-batch (coverage, epe_px) of the merged flow vs the planted roll."""
    from ransacflow_tpu.eval.compose import reconstruct_flows, merge_multi_h

    truth, valid = planted_truth(src_h, src_w, ht, wt)
    covs, epes = [], []
    for i in range(outs["count"].shape[0]):
        n = int(outs["count"][i])
        if n == 0:
            covs.append(0.0)
            epes.append(float("nan"))
            continue
        flows, matches = reconstruct_flows(
            outs["hs"][i][:n].astype(np.float32),
            outs["flows"][i][:n].astype(np.float32),
            outs["matches"][i][:n].astype(np.float32),
            ht, wt, cycle_match=False)
        merged = merge_multi_h(flows, matches, bin_th)
        cover = merged["match_binary"] & valid
        covs.append(float(cover.sum() / max(valid.sum(), 1)))
        if cover.sum() == 0:
            epes.append(float("nan"))
            continue
        err_n = merged["flow"] - truth
        # normalized -> source px -> target px (source is 2x target scale)
        ex = err_n[..., 0] * (src_w - 1) / 2.0 / 2.0
        ey = err_n[..., 1] * (src_h - 1) / 2.0 / 2.0
        epes.append(float(np.hypot(ex, ey)[cover].mean()))
    return float(np.mean(covs)), float(np.nanmean(epes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50000)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--binTh", type=float, default=0.95,
                    help="matchability binarization for the merge")
    ap.add_argument("--ths", type=float, nargs="+",
                    default=[0.005, 0.01, 0.02, 0.05])
    args = ap.parse_args()

    import jax.numpy as jnp
    from ransacflow_tpu.models import (
        init_resnet50_layer3, cast_params, load_params_npz,
    )
    import jax

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    accept_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "accept_weights.npz")
    align_f32 = load_params_npz(accept_path)

    shapes = bench.pyramid_shapes()
    src_h, src_w = shapes[0]
    ht, wt = bench.ASPECT[0] // 16 * 16, bench.ASPECT[1] // 16 * 16

    rows = []
    for dtype in ("float32", "bfloat16"):
        if dtype == "float32":
            rp, ap_ = resnet_f32, align_f32
        else:
            rp = cast_params(resnet_f32, jnp.bfloat16)
            ap_ = cast_params(align_f32, jnp.bfloat16)
        for th in args.ths:
            pps, avg_h, outs = bench.bench_multihomo(
                rp, ap_, n_pairs=args.pairs, related=True,
                mask_region_th=th, n_iter=args.iters, return_outs=True)
            cov, epe = quality(outs, src_h, src_w, ht, wt, args.binTh)
            row = {"dtype": dtype, "mask_region_th": th,
                   "pairs_s": round(pps, 2), "avg_h": round(avg_h, 2),
                   "coverage": round(cov, 4), "epe_px": round(epe, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "accept_th_sweep", "rows": rows}))


if __name__ == "__main__":
    main()
