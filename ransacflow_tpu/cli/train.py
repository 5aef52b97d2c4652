"""Training CLI (train/train.py mirror + stage presets).

Usage:
  python -m ransacflow_tpu.cli.train --trainImgDir data/train --outDir runs/s1 \
      --stage 1                               # curriculum preset
  python -m ransacflow_tpu.cli.train --trainMode flow+match --mu-cycle 1 ... \
      valMegaDepth --valCSV ... --valImgDir ... --inPklCoarse ...

`--stage {1,2,3}` applies the reference's stage1/2/3.sh presets; explicit
flags override. `--nDevices N` enables data-parallel training over a mesh.

Multi-host (pod slice beyond one host): launch the SAME command on every
host with `--distributed` and `--nDevices <global device count>`; JAX's
cluster env (TPU metadata, or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
JAX_PROCESS_ID elsewhere) wires the processes together:

  python -m ransacflow_tpu.cli.train --distributed --nDevices 32 \
      --batchSize 64 --trainImgDir ... --outDir ... --stage 1 NoVal

Each process loads a disjoint shard of the pair list (the reference's
DistributedSampler role, segNet/lib/utils/data/distributed.py:7-57);
process 0 owns validation and checkpoints. --batchSize is GLOBAL.
"""

import argparse

import jax

from ransacflow_tpu.train.loop import fit, resume_params, STAGES
from ransacflow_tpu.pipeline import init_alignment_params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nEpochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--trainImgDir", type=str, required=True)
    parser.add_argument("--kernelSize", type=int, default=7)
    parser.add_argument("--imgSize", type=int, default=224)
    parser.add_argument("--batchSize", type=int, default=16)
    parser.add_argument("--outDir", type=str, required=True)
    parser.add_argument("--resumePth", type=str, default=None)
    parser.add_argument("--lambda-match", type=float, default=0.01,
                        dest="lambda_match")
    parser.add_argument("--mu-cycle", type=float, default=None,
                        dest="mu_cycle")
    parser.add_argument("--grad", type=float, default=None)
    parser.add_argument("--trainMode", choices=["flow", "flow+match", "grad"],
                        default=None)
    parser.add_argument("--margin", type=int, default=88)
    parser.add_argument("--stage", type=int, choices=[1, 2, 3], default=None,
                        help="curriculum preset (stage1/2/3.sh)")
    parser.add_argument("--nDevices", type=int, default=1)
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: call jax.distributed.initialize() "
                             "before touching devices (run the same command "
                             "on every host of the slice; --nDevices is the "
                             "GLOBAL device count, --batchSize the global "
                             "batch)")
    parser.add_argument("--computeDtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="mixed-precision conv compute (fp32 masters)")
    parser.add_argument("--nativeResize", action="store_true",
                        help="resize train pairs with the C++ Lanczos "
                        "resampler (ransacflow_tpu.native) instead of PIL; "
                        "falls back to PIL if the toolchain is missing")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the feature trunk in backward "
                             "(same numerics, smaller activation memory)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--maxStepsPerEpoch", type=int, default=None)

    sub = parser.add_subparsers(title="validation choice", dest="subcommand")
    val = sub.add_parser("valMegaDepth")
    val.add_argument("--valImgDir", type=str, required=True)
    val.add_argument("--valCSV", type=str, required=True)
    val.add_argument("--inPklCoarse", type=str, required=True)
    val.add_argument("--valMinSize", type=int, default=480,
                     help="validation resize min side (ref hard-codes 480, "
                          "train/validation.py:60)")
    noval = sub.add_parser("NoVal")
    noval.add_argument("--epochSaveModel", type=int, default=10)

    args = parser.parse_args()

    if args.distributed:
        # must run before any other jax API touches the backend
        jax.distributed.initialize()
        print(f"distributed: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    cfg = dict(mode="flow", mu_cycle=0.0, lambda_match=0.01,
               grad_weight=0.0, epochs=150)
    if args.stage is not None:
        cfg.update(STAGES[args.stage])
    if args.trainMode is not None:
        cfg["mode"] = args.trainMode
    if args.mu_cycle is not None:
        cfg["mu_cycle"] = args.mu_cycle
    if args.grad is not None:
        cfg["grad_weight"] = args.grad
    if args.nEpochs is not None:
        cfg["epochs"] = args.nEpochs
    cfg["lambda_match"] = args.lambda_match
    if "match" not in cfg["mode"]:
        cfg["lambda_match"] = 0.0
        print("trainMode without matchability: lambda_match forced to 0")

    params = init_alignment_params(jax.random.PRNGKey(args.seed),
                                   args.kernelSize)
    if args.resumePth:
        params = resume_params(args.resumePth, params)

    fit(
        params,
        args.trainImgDir,
        args.outDir,
        mode=cfg["mode"],
        mu_cycle=cfg["mu_cycle"],
        lambda_match=cfg["lambda_match"],
        grad_weight=cfg["grad_weight"],
        epochs=cfg["epochs"],
        batch_size=args.batchSize,
        img_size=args.imgSize,
        margin=args.margin,
        lr=args.lr,
        kernel_size=args.kernelSize,
        val_csv=getattr(args, "valCSV", None),
        val_dir=getattr(args, "valImgDir", None),
        val_coarse_pkl=getattr(args, "inPklCoarse", None),
        val_min_size=getattr(args, "valMinSize", 480),
        epoch_save_model=getattr(args, "epochSaveModel", 10),
        n_devices=args.nDevices,
        seed=args.seed,
        max_steps_per_epoch=args.maxStepsPerEpoch,
        compute_dtype=(None if args.computeDtype == "float32"
                       else args.computeDtype),
        remat=args.remat,
        use_native=args.nativeResize,
    )


if __name__ == "__main__":
    main()
