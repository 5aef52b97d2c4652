"""YFCC two-view geometry harness CLI.

  python -m ransacflow_tpu.cli.eval_yfcc predict --testImg data/YFCC/images \
      --testPair data/YFCC/pairs --testScene reichstag --outDir pred/
  python -m ransacflow_tpu.cli.eval_yfcc results --predDir pred/ \
      --gtPath data/YFCC/images --testPair data/YFCC/pairs \
      --scene 2 --multiH --ransac
"""

import argparse
import json
import os

from ransacflow_tpu.cli.common import (
    add_adaptive_flag,
    add_compute_dtype_flag,
    add_model_args,
    add_segnet_args,
    add_fused_flag,
    cast_for_dtype,
    load_align_params,
    load_coarse_net,
    build_sky_fn,
    resolve_n_devices,
)
from ransacflow_tpu.eval.yfcc import SCENES


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict")
    add_model_args(p)
    add_segnet_args(p)
    p.add_argument("--testImg", type=str, required=True)
    p.add_argument("--testPair", type=str, required=True)
    p.add_argument("--testScene", type=str, default=None, choices=SCENES)
    p.add_argument("--outDir", type=str, required=True)
    p.add_argument("--minSize", type=int, default=480)
    p.add_argument("--coarseIter", type=int, default=10000)
    p.add_argument("--maskRegionTh", type=float, default=0.01)
    p.add_argument("--maxCoarse", type=int, default=10)
    p.add_argument("--coarsetolerance", type=float, default=0.05)
    p.add_argument("--nbScale", type=int, default=7)
    p.add_argument("--scaleR", type=float, default=2.0)
    p.add_argument("--beginIndex", type=int, default=0)
    p.add_argument("--endIndex", type=int, default=1000)
    p.add_argument("--nDevices", type=int, default=None,
                   help="shard pairs over a local device pool (keys become "
                        "pair-indexed; artifacts identical for any pool size)")
    p.add_argument("--batchPairs", type=int, default=None,
                   help="with --nDevices: batch same-resized-shape pairs "
                        "into single multi-homography dispatches (identical "
                        "artifacts, one dispatch+readback per batch)")
    add_fused_flag(p)
    add_adaptive_flag(p)
    add_compute_dtype_flag(p)

    r = sub.add_parser("results")
    r.add_argument("--predDir", type=str, required=True)
    r.add_argument("--gtPath", type=str, required=True)
    r.add_argument("--testPair", type=str, required=True)
    r.add_argument("--scene", type=int, choices=[0, 1, 2, 3], required=True)
    r.add_argument("--multiH", action="store_true")
    r.add_argument("--ransac", action="store_true")
    r.add_argument("--threshold", type=float, default=0.0005)
    r.add_argument("--th", type=float, default=0.95)
    r.add_argument("--outRes", type=str, default="out.json")

    args = parser.parse_args()

    if args.cmd == "predict":
        from ransacflow_tpu.eval import predict_yfcc, pooled_yfcc_predict
        from ransacflow_tpu.pipeline import CoarseAligner

        coarse_kwargs = dict(
            nb_scale=args.nbScale, n_iter=args.coarseIter,
            tolerance=args.coarsetolerance, min_size=args.minSize,
            scale_r=args.scaleR, resize_mode="min",
            # the YFCC harness uses the quick-start matching variant: masked
            # target features are RE-matched against the bank every coarse
            # call, so excluded regions free their source cells (reference
            # evalYFCC/coarseAlignFeatMatch.py:163-169) — unlike the other
            # eval harnesses, which filter one cached match set
            rematch_per_call=True,
            adaptive_chunk=args.adaptiveChunk,
            anchor_stride=args.anchorStride,
            relax_cells=args.relaxCells,
        )
        resnet = cast_for_dtype(
            load_coarse_net(args.mocoPth, args.imageNetPth),
            args.computeDtype)
        align = cast_for_dtype(
            load_align_params(args.resumePth, args.kernelSize),
            args.computeDtype)
        scenes = [args.testScene] if args.testScene else list(SCENES)
        for scene in scenes:
            common = dict(
                max_coarse=args.maxCoarse,
                mask_region_th=args.maskRegionTh,
                begin_index=args.beginIndex, end_index=args.endIndex,
                bg_mask_fn=build_sky_fn(args, rotated=True),
            )
            pair_pkl = os.path.join(
                args.testPair, f"{scene}-te-1000-pairs.pkl"
            )
            img_dir = os.path.join(args.testImg, scene, "test")
            out_dir = os.path.join(args.outDir, scene)
            n_devices = resolve_n_devices(args)
            if n_devices is not None:
                pooled_yfcc_predict(
                    pair_pkl, img_dir, out_dir, resnet, align,
                    n_devices, coarse_kwargs,
                    batch_pairs=args.batchPairs, **common,
                )
            else:
                predict_yfcc(
                    pair_pkl, img_dir, out_dir,
                    CoarseAligner(resnet, **coarse_kwargs), align,
                    **common,
                )
    else:
        from ransacflow_tpu.eval import evaluate_yfcc

        scene = SCENES[args.scene]
        errors, accs = evaluate_yfcc(
            os.path.join(args.predDir, scene),
            os.path.join(args.testPair, f"{scene}-te-1000-pairs.pkl"),
            os.path.join(args.gtPath, scene, "test"),
            multi_h=args.multiH, th=args.th,
            use_ransac=args.ransac, threshold=args.threshold,
        )
        for k, v in accs.items():
            print(f"Scene {scene} {k}: {v:.4f}")
        with open(args.outRes, "w") as f:
            json.dump({scene: errors, "accs": accs}, f)


if __name__ == "__main__":
    main()
