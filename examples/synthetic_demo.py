"""No-dataset demo: align a synthetically warped pair end to end.

Creates a textured image, warps it by a known homography, runs the full
coarse+fine pipeline with random-init weights, and reports how well the
known transform was recovered (plus output visualizations).

  python examples/synthetic_demo.py [--outdir demo_out]

With released checkpoints available, pass --resumePth/--imageNetPth to see
trained-quality fine alignment (see scripts/download_models.sh).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", type=str, default="demo_out")
    parser.add_argument("--resumePth", type=str, default=None)
    parser.add_argument("--imageNetPth", type=str, default=None)
    parser.add_argument("--size", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from ransacflow_tpu.ops import warp_grid, grid_sample, apply_homography
    from ransacflow_tpu.pipeline import RansacFlowAligner, init_alignment_params
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.cli.common import load_align_params, load_coarse_net
    from ransacflow_tpu.cli.align import save_blend

    s = args.size
    rng = np.random.RandomState(0)
    base = (rng.rand(s // 4, s // 4, 3) > 0.5).astype(np.float32)
    src_arr = np.kron(base, np.ones((4, 4, 1), np.float32))[:s, :s]
    # known transform: one-feature-cell (16 px) translation — recoverable
    # even with random-init features; see tests/test_pipeline.py for why
    t = 2 * 16.0 / s
    h_true = np.array([[1, 0, t], [0, 1, t], [0, 0, 1]], np.float32)
    grid = warp_grid(jnp.asarray(h_true)[None], s, s)
    tgt_arr = np.asarray(grid_sample(jnp.asarray(src_arr)[None], grid))[0]

    src = Image.fromarray((src_arr * 255).astype(np.uint8))
    tgt = Image.fromarray((np.clip(tgt_arr, 0, 1) * 255).astype(np.uint8))

    if args.resumePth:
        align = load_align_params(args.resumePth)
        resnet = load_coarse_net(None, args.imageNetPth)
    else:
        print("using random-init nets (pass --resumePth for trained quality)")
        align = init_alignment_params(jax.random.PRNGKey(0))
        resnet = init_resnet50_layer3(jax.random.PRNGKey(1))

    aligner = RansacFlowAligner(
        align, resnet, nb_scale=1, n_iter=3000, min_size=s, resize_mode="min"
    )
    border = np.ones((s, s), np.float32)
    border[s // 5 : -s // 5, s // 5 : -s // 5] = 0  # exclude image borders
    out = aligner.align_images(src, tgt, exclusion_mask=border)
    if out["H21"] is None:
        print("no homography found")
        return

    h_est = out["H21"] / out["H21"][2, 2]
    pts = np.random.RandomState(1).rand(64, 2).astype(np.float32) * 1.2 - 0.6
    a = np.asarray(apply_homography(jnp.asarray(h_est), jnp.asarray(pts)))
    b = np.asarray(apply_homography(jnp.asarray(h_true), jnp.asarray(pts)))
    err_px = np.abs(a - b).mean() * (s - 1) / 2

    os.makedirs(args.outdir, exist_ok=True)
    save_blend(src_arr, out["target"],
               os.path.join(args.outdir, "before.png"))
    save_blend(out["warped_coarse"], out["target"],
               os.path.join(args.outdir, "after_coarse.png"))
    save_blend(out["warped_fine"], out["target"],
               os.path.join(args.outdir, "after_fine.png"))
    print(f"true H (normalized):\n{h_true}")
    print(f"recovered H:\n{np.round(h_est, 4)}")
    print(f"mean grid error: {err_px:.2f} px at {s}px")
    print(f"visualizations in {args.outdir}/")


if __name__ == "__main__":
    main()
