"""Bisect the per-iteration cost of the device-resident multi-homography
loop at the HPatches eval config (minSize 480, 50k RANSAC iters).

Times each stage of `_fused_multi_homo`'s body in isolation, K reps inside
one lax.scan jit (dev-tunnel timing rules, CLAUDE.md):
  - ransac50k: 50k-hypothesis homography RANSAC on ~1.2k matches
  - fine: pred_flow_mask at 480x640 (warp, feature CNN, bidir corr, heads)
  - mask: exclusion-mask bookkeeping (interpolate + threshold + rematch)
  - feats: coarse feature bank (7 scales) + target features + matching

Usage: python scripts/bisect_multihomo.py [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n_iter", type=int, default=50000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import pyramid_shapes, ASPECT
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import device_pyramid, _bank_coords
    from ransacflow_tpu.pipeline.coarse import _coarse_feats
    from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features
    from ransacflow_tpu.ops.matching import mutual_matching
    from ransacflow_tpu.ops.ransac import ransac_homography
    from ransacflow_tpu.ops.homography import warp_grid
    from ransacflow_tpu.ops.grid import feature_cell_coords
    from ransacflow_tpu.ops.sampler import interpolate_bilinear

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))
    shapes = pyramid_shapes()
    rng = np.random.RandomState(1)
    src_h, src_w = shapes[0]
    ht, wt = ASPECT[0] // 16 * 16, ASPECT[1] // 16 * 16

    source = jnp.asarray(rng.rand(1, src_h, src_w, 3).astype(np.float32))
    target = jnp.asarray(rng.rand(1, ht, wt, 3).astype(np.float32))

    # pair setup (feature banks)
    pyr = device_pyramid(source, shapes)
    feats = [_coarse_feats(resnet_params, im) for im in pyr]
    bank = jnp.concatenate(feats, axis=0)
    coords_a = _bank_coords(shapes)
    featt = _coarse_feats(resnet_params, target)
    m = mutual_matching(bank.T, featt.T)
    fy, fx = ht // 16, wt // 16
    y, x = feature_cell_coords(fy, fx)
    coords_b = jnp.stack([x, y], axis=1)
    n_b = coords_b.shape[0]
    ones = jnp.ones((n_b, 1), jnp.float32)
    m1 = jnp.concatenate([coords_a[m.src_idx], ones], axis=1)
    m2 = jnp.concatenate([coords_b, ones], axis=1)
    src_mid = pyr[len(shapes) // 2]
    featt_fine = fine_features(align_params, target)
    flow_c = warp_grid(jnp.eye(3, dtype=jnp.float32)[None], ht, wt)

    def timed(name, fn, *fargs):
        def make(n):
            @jax.jit
            def run(key):
                def body(c, i):
                    k = jax.random.fold_in(key, i)
                    out = fn(k, *fargs)
                    # fold a scalar from out into carry so nothing is DCE'd
                    s = jax.tree.reduce(
                        lambda a, b: a + jnp.sum(b).astype(jnp.float32),
                        out, jnp.float32(0),
                    )
                    return c + s, None
                tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return tot
            return run

        r1, rn = make(1), make(args.iters)
        np.asarray(r1(jax.random.PRNGKey(0)))
        np.asarray(rn(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        np.asarray(rn(jax.random.PRNGKey(1)))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(r1(jax.random.PRNGKey(1)))
        t1 = time.perf_counter() - t0
        ms = (tn - t1) / (args.iters - 1) * 1000.0
        print(json.dumps({"stage": name, "ms": round(ms, 2)}))
        return ms

    timed("ransac50k", lambda k: ransac_homography(
        k, m1, m2, m.valid, 0.05, n_iter=args.n_iter).num_inliers)

    # -- per-pair setup stages (outside the loop, once per pair) ------------
    def pyramid_stage(k):
        pyr2 = device_pyramid(source + 0 * k[0], shapes)
        return [jnp.sum(im) for im in pyr2]
    timed("setup_pyramid_lanczos", pyramid_stage)

    def bankfeat_stage(k):
        feats2 = [_coarse_feats(resnet_params, im + 0 * k[0]) for im in pyr]
        return jnp.concatenate(feats2, axis=0).sum()
    timed("setup_bank_resnets", bankfeat_stage)

    def match_stage(k):
        mm = mutual_matching(bank.T + 0 * k[0], featt.T)
        return mm.valid.astype(jnp.int32)
    timed("setup_mutual_match", match_stage)

    def finefeat_stage(k):
        return jnp.sum(fine_features(align_params, target + 0 * k[0]))
    timed("setup_fine_features", finefeat_stage)

    timed("fine_480", lambda k: pred_flow_mask(
        align_params, src_mid, featt_fine, flow_c, cycle_match=False)["match"])

    def mask_stage(k):
        mask = jax.random.uniform(k, (ht, wt))
        cell = interpolate_bilinear(mask[None, :, :, None], fy, fx)
        return (cell[0, :, :, 0] > 0.5).reshape(-1).astype(jnp.int32)
    timed("mask_bookkeeping", mask_stage)

    def feats_stage(k):
        feats = [_coarse_feats(resnet_params, im + 0 * k[0]) for im in pyr]
        b = jnp.concatenate(feats, axis=0)
        ftt = _coarse_feats(resnet_params, target)
        mm = mutual_matching(b.T, ftt.T)
        return mm.valid.astype(jnp.int32)
    timed("coarse_feats_and_match", feats_stage)


if __name__ == "__main__":
    main()
