"""Coarse-aligned training-pair generation (the reference notebook
train/generate_coarse_aligned_pair.ipynb as a CLI).

For each input pair: 3-scale (x0.5, x1, x2) coarse features, mutual
matching, RANSAC homography; if the winner has > --minInliers inliers, the
second image is warped onto the first's frame and the pair is written as
``{index}_1.jpg`` / ``{index}_2.jpg`` — the PairFolder training layout.

  python -m ransacflow_tpu.cli.generate_pairs --pairCSV pairs.csv \
      --imgDir imgs/ --outDir train_pairs/ [--mocoPth resnet50_moco.pth]

pairCSV columns: imgA, imgB (paths relative to --imgDir).
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
from PIL import Image

from ransacflow_tpu.cli.common import add_model_args, load_coarse_net
from ransacflow_tpu.pipeline.coarse import _coarse_feats
from ransacflow_tpu.ops import (
    mutual_matching,
    ransac_homography,
    warp_grid,
    grid_sample,
    feature_cell_coords,
)
from ransacflow_tpu.utils.image import resize_round_stride, to_array


def align_pair(resnet_params, img1, img2, key, min_size=480, n_iter=10000,
               tolerance=0.05):
    """Returns (n_inliers, H21 mapping img1 coords -> img2 coords,
    resized img1 array, resized img2 array)."""
    scales = [min_size // 2, min_size, min_size * 2]
    feats, xs, ys = [], [], []
    for s in scales:
        arr = to_array(resize_round_stride(img1, s, stride=16))
        f = _coarse_feats(resnet_params, jnp.asarray(arr)[None])
        fh, fw = arr.shape[0] // 16, arr.shape[1] // 16
        y, x = feature_cell_coords(fh, fw)
        feats.append(f)
        xs.append(x)
        ys.append(y)
    bank = jnp.concatenate(feats, axis=0)
    coords1 = jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=1)

    arr1 = to_array(resize_round_stride(img1, min_size, stride=16))
    arr2 = to_array(resize_round_stride(img2, min_size, stride=16))
    f2 = _coarse_feats(resnet_params, jnp.asarray(arr2)[None])
    fh2, fw2 = arr2.shape[0] // 16, arr2.shape[1] // 16
    y2, x2 = feature_cell_coords(fh2, fw2)
    coords2 = jnp.stack([x2, y2], axis=1)

    m = mutual_matching(bank.T, f2.T)
    n2 = coords2.shape[0]
    ones = jnp.ones((n2, 1), jnp.float32)
    # fit the map from img1 (multi-scale bank) coords to img2 coords so the
    # warp grid samples img2 on img1's frame
    m_src = jnp.concatenate([coords2, ones], axis=1)
    m_tgt = jnp.concatenate([coords1[m.src_idx], ones], axis=1)
    res = ransac_homography(key, m_src, m_tgt, m.valid, tolerance,
                            n_iter=n_iter)
    return int(res.num_inliers), np.asarray(res.H21), arr1, arr2


def main():
    parser = argparse.ArgumentParser()
    add_model_args(parser)
    parser.add_argument("--pairCSV", type=str, required=True)
    parser.add_argument("--imgDir", type=str, required=True)
    parser.add_argument("--outDir", type=str, required=True)
    parser.add_argument("--minSize", type=int, default=480)
    parser.add_argument("--nbIter", type=int, default=10000)
    parser.add_argument("--tolerance", type=float, default=0.05)
    parser.add_argument("--minInliers", type=int, default=50)
    args = parser.parse_args()

    resnet = load_coarse_net(args.mocoPth, args.imageNetPth)
    df = pd.read_csv(args.pairCSV)
    os.makedirs(args.outDir, exist_ok=True)

    kept = 0
    key = jax.random.PRNGKey(0)
    for i in range(len(df)):
        row = df.iloc[i]
        img1 = Image.open(os.path.join(args.imgDir, row["imgA"])).convert("RGB")
        img2 = Image.open(os.path.join(args.imgDir, row["imgB"])).convert("RGB")
        key, sub = jax.random.split(key)
        n_inl, H21, arr1, arr2 = align_pair(
            resnet, img1, img2, sub, args.minSize, args.nbIter, args.tolerance
        )
        if n_inl <= args.minInliers:
            continue
        h, w = arr1.shape[:2]
        grid = warp_grid(jnp.asarray(H21)[None], h, w)
        warped2 = np.asarray(grid_sample(jnp.asarray(arr2)[None], grid))[0]
        Image.fromarray((np.clip(arr1, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.outDir, f"{kept}_1.jpg"))
        Image.fromarray((np.clip(warped2, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.outDir, f"{kept}_2.jpg"))
        kept += 1
    print(f"kept {kept}/{len(df)} pairs (> {args.minInliers} inliers)")


if __name__ == "__main__":
    main()
