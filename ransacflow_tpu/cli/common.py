"""Shared CLI plumbing: weight loading and coarse-net selection."""

import jax


def load_align_params(resume_path, kernel_size=7):
    """Alignment nets from a reference .pth, an orbax dir, or random init."""
    from ransacflow_tpu.pipeline import init_alignment_params

    if not resume_path:
        print("WARNING: no --resumePth given, using random-init nets")
        return init_alignment_params(jax.random.PRNGKey(0), kernel_size)
    if resume_path.endswith(".pth"):
        from ransacflow_tpu.models import load_alignment_checkpoint

        return load_alignment_checkpoint(resume_path)
    from ransacflow_tpu.train import load_checkpoint

    return load_checkpoint(resume_path)["params"]


def load_coarse_net(moco_path=None, imagenet_path=None):
    """Coarse ResNet-50 trunk weights.

    The reference selects torchvision-pretrained (--imageNet) or the MoCo
    checkpoint; in this offline environment both must be provided as files.
    Falls back to random init with a warning.
    """
    from ransacflow_tpu.models import load_resnet50_trunk, init_resnet50_layer3

    if moco_path:
        return load_resnet50_trunk(moco_path, moco=True)
    if imagenet_path:
        return load_resnet50_trunk(imagenet_path)
    print("WARNING: no coarse-feature weights given, using random init")
    return init_resnet50_layer3(jax.random.PRNGKey(0))


def add_model_args(parser):
    parser.add_argument("--resumePth", type=str, default=None,
                        help="alignment checkpoint (.pth or orbax dir)")
    parser.add_argument("--kernelSize", type=int, default=7)
    parser.add_argument("--mocoPth", type=str, default=None,
                        help="MoCo ResNet-50 .pth for coarse features")
    parser.add_argument("--imageNetPth", type=str, default=None,
                        help="torchvision ResNet-50 state_dict .pth")


def add_segnet_args(parser):
    parser.add_argument("--segNet", action="store_true",
                        help="remove sky with the segmentation net")
    parser.add_argument("--segEncoderPth", type=str, default=None)
    parser.add_argument("--segDecoderPth", type=str, default=None)


def build_sky_fn(args, rotated=False):
    if not getattr(args, "segNet", False):
        return None
    from ransacflow_tpu.models import (
        state_dict_to_tree,
        load_torch_checkpoint,
        SkySegmenter,
    )
    from ransacflow_tpu.eval import make_sky_bg_fn, make_sky_bg_fn_rotated

    enc = state_dict_to_tree(load_torch_checkpoint(args.segEncoderPth))
    dec = state_dict_to_tree(load_torch_checkpoint(args.segDecoderPth))
    seg = SkySegmenter(enc, dec, seg_id=2, seg_fg=False)
    return make_sky_bg_fn_rotated(seg) if rotated else make_sky_bg_fn(seg)


def add_fused_flag(parser):
    parser.add_argument(
        "--fused", action="store_true",
        help="route sequential (no --nDevices) prediction through the "
             "device-resident fused multi-homography loop: one dispatch + "
             "one readback per pair instead of ~4 host syncs per "
             "homography. Sugar for --nDevices 1. Artifacts match the "
             "host loop except its optional fp64 DLT polish "
             "(pipeline/multihomo.py documents the divergences).")


def resolve_n_devices(args):
    """--fused is sugar for --nDevices 1 when no pool size is given."""
    if args.nDevices is None and getattr(args, "fused", False):
        return 1
    return args.nDevices


def add_compute_dtype_flag(parser):
    parser.add_argument(
        "--computeDtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="cast model weights (and therefore conv compute) to this "
             "dtype on the eval path. float32 is the reference-parity "
             "default; bfloat16 is the measured-safe fast mode — the "
             "round-5 accept-threshold sweep (docs/PERFORMANCE.md) found "
             "identical coverage (1.0) across the whole mask_region_th "
             "grid with earlier multi-homography exits, ~+30%% pairs/s")


def cast_for_dtype(params, dtype_str):
    """Cast a param tree for --computeDtype; identity for float32/None."""
    if params is None or dtype_str in (None, "float32"):
        return params
    import jax.numpy as jnp

    from ransacflow_tpu.models import cast_params

    return cast_params(params, jnp.dtype(dtype_str))


def add_adaptive_flag(parser):
    parser.add_argument(
        "--adaptiveChunk", type=int, default=0,
        help="confidence-based RANSAC early exit (opt-in TPU mode): "
             "evaluate hypotheses in blocks of this size and stop once "
             "the 0.999-confidence bound is met; --coarseIter becomes a "
             "cap. 0 = fixed iteration count (reference-parity default)")
    parser.add_argument(
        "--anchorStride", type=int, default=0,
        help="anchor-stride feature pyramid (opt-in approximation): run "
             "the coarse trunk only at every k-th pyramid scale and "
             "bilinearly feature-resample the rest from the nearest "
             "anchor (+28%% serving throughput measured at stride 3; "
             "quality cost in docs/PERFORMANCE.md). 0 = exact per-scale "
             "trunk (reference-parity default)")
    parser.add_argument(
        "--relaxCells", type=int, default=0,
        help="relaxed mutual-match reciprocity (opt-in companion to "
             "--anchorStride): accept a match when the back-match lands "
             "within this many target feature cells instead of exact "
             "index reciprocity — repairs the anchor mode's "
             "vote-splitting match losses (mechanism + measured quality "
             "in docs/PERFORMANCE.md). 0 = reference semantics (parity "
             "default)")
