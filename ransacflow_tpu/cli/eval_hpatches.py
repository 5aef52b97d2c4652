"""HPatches harness CLI: predict then results.

  python -m ransacflow_tpu.cli.eval_hpatches predict --outDir pred/ \
      --csv-path csv/ --image-data-path imgs/ [--resumePth model.pth]
  python -m ransacflow_tpu.cli.eval_hpatches results --predDir pred/ \
      --csv-path csv/ --image-data-path imgs/ --multiH
"""

import argparse

import numpy as np

from ransacflow_tpu.cli.common import (
    add_adaptive_flag,
    add_compute_dtype_flag,
    add_model_args,
    cast_for_dtype,
    add_segnet_args,
    add_fused_flag,
    load_align_params,
    load_coarse_net,
    build_sky_fn,
    resolve_n_devices,
)


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict")
    add_model_args(p)
    add_segnet_args(p)
    p.add_argument("--csv-path", type=str, required=True)
    p.add_argument("--image-data-path", type=str, required=True)
    p.add_argument("--outDir", type=str, required=True)
    p.add_argument("--coarseIter", type=int, default=50000)
    p.add_argument("--maskRegionTh", type=float, default=0.01)
    p.add_argument("--maxCoarse", type=int, default=10)
    p.add_argument("--coarsetolerance", type=float, default=0.05)
    p.add_argument("--nbScale", type=int, default=7)
    p.add_argument("--minSize", type=int, default=480)
    p.add_argument("--scaleR", type=float, default=2.0)
    p.add_argument("--beginIndex", type=int, default=0)
    p.add_argument("--nDevices", type=int, default=None,
                   help="shard pairs over N local devices (device-resident "
                        "multi-homography loop); default: host loop")
    p.add_argument("--batchPairs", type=int, default=None,
                   help="with --nDevices: batch same-resized-shape pairs "
                        "into single multi-homography dispatches (identical "
                        "artifacts, one dispatch+readback per batch)")
    p.add_argument("--endIndex", type=int, default=None)
    add_fused_flag(p)
    add_adaptive_flag(p)
    add_compute_dtype_flag(p)

    r = sub.add_parser("results")
    r.add_argument("--predDir", type=str, required=True)
    r.add_argument("--csv-path", type=str, required=True)
    r.add_argument("--image-data-path", type=str, required=True)
    r.add_argument("--multiH", action="store_true")
    r.add_argument("--th", type=float, default=1.0)
    r.add_argument("--minSize", type=int, default=240)
    r.add_argument("--onlyCoarse", action="store_true")

    args = parser.parse_args()

    if args.cmd == "predict":
        from ransacflow_tpu.eval import predict_hpatches

        predict_hpatches(
            getattr(args, "csv_path"), getattr(args, "image_data_path"),
            args.outDir,
            cast_for_dtype(load_coarse_net(args.mocoPth, args.imageNetPth),
                           args.computeDtype),
            cast_for_dtype(load_align_params(args.resumePth, args.kernelSize),
                           args.computeDtype),
            min_size=args.minSize, nb_scale=args.nbScale,
            n_iter=args.coarseIter, tolerance=args.coarsetolerance,
            scale_r=args.scaleR, max_coarse=args.maxCoarse,
            mask_region_th=args.maskRegionTh,
            bg_mask_fn=build_sky_fn(args),
            begin_index=args.beginIndex, end_index=args.endIndex,
            n_devices=resolve_n_devices(args), batch_pairs=args.batchPairs,
            adaptive_chunk=args.adaptiveChunk,
            anchor_stride=args.anchorStride,
            relax_cells=args.relaxCells,
        )
    else:
        from ransacflow_tpu.eval import evaluate_hpatches

        res, _ = evaluate_hpatches(
            args.predDir, getattr(args, "csv_path"),
            getattr(args, "image_data_path"), out_size=args.minSize,
            multi_h=args.multiH, th=args.th, only_coarse=args.onlyCoarse,
        )
        for scene, aepe in res.items():
            print(f"Scene {scene}, Average end-point error (EPE): {aepe:.3f}")
        print(f"Overall mean AEPE: {np.mean(list(res.values())):.3f}")


if __name__ == "__main__":
    main()
