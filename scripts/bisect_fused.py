"""Cumulative bisection of the fused single-homography serving program.

Times progressively larger prefixes of `fused_align`'s pipeline (pyramid,
+features, +matching, +RANSAC, full) with the K-reps-in-one-scan harness,
so consecutive deltas attribute the per-pair cost. The bench's 24 ms/pair
was not explained by component-in-isolation numbers; cumulative prefixes
include the real layouts/fusions of the full program.

Usage: python scripts/bisect_fused.py [--iters 8]
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
    ap.add_argument("--s2d", action="store_true",
                    help="run the trunk stem as the space-to-depth rewrite")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import pyramid_shapes, ASPECT, N_ITER
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import (
        device_pyramid, _coarse_match, _fine_with_gate,
    )
    from ransacflow_tpu.ops.ransac import ransac_homography

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))
    shapes = pyramid_shapes()
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(1, *shapes[0], 3).astype(np.float32))
    ht, wt = ASPECT[0] // 16 * 16, ASPECT[1] // 16 * 16
    tgt = jnp.asarray(rng.rand(1, ht, wt, 3).astype(np.float32))

    def upto_pyramid(k):
        pyr = device_pyramid(src + 0 * k[0].astype(src.dtype), shapes)
        return sum(jnp.sum(im) for im in pyr)

    def upto_match(k):
        pyr = device_pyramid(src + 0 * k[0].astype(src.dtype), shapes)
        m1, m2, valid = _coarse_match(resnet_params, pyr, tgt, stem_s2d=args.s2d)
        return jnp.sum(m1) + jnp.sum(valid)

    def upto_ransac(k):
        pyr = device_pyramid(src + 0 * k[0].astype(src.dtype), shapes)
        m1, m2, valid = _coarse_match(resnet_params, pyr, tgt, stem_s2d=args.s2d)
        res = ransac_homography(k, m1, m2, valid, 0.05, n_iter=N_ITER)
        return res.num_inliers

    def full(k):
        pyr = device_pyramid(src + 0 * k[0].astype(src.dtype), shapes)
        m1, m2, valid = _coarse_match(resnet_params, pyr, tgt, stem_s2d=args.s2d)
        res = ransac_homography(k, m1, m2, valid, 0.05, n_iter=N_ITER)
        out = _fine_with_gate(align_params, pyr, tgt, res, True, 7)
        return out["num_inliers"] + jnp.sum(out["flow_down8"])

    def timed(name, fn):
        def make(n):
            @jax.jit
            def run(key):
                def body(c, i):
                    out = fn(jax.random.fold_in(key, i))
                    return c + jnp.sum(out).astype(jnp.float32), None
                tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
                return tot
            return run

        r1, rn = make(1), make(args.iters)
        np.asarray(r1(jax.random.PRNGKey(0)))
        np.asarray(rn(jax.random.PRNGKey(0)))
        best = float("inf")
        for s in (1, 2):
            t0 = time.perf_counter()
            np.asarray(rn(jax.random.PRNGKey(s)))
            tn = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(r1(jax.random.PRNGKey(s)))
            t1 = time.perf_counter() - t0
            best = min(best, (tn - t1) / (args.iters - 1))
        print(json.dumps({"stage": name, "ms": round(best * 1000.0, 2)}),
              flush=True)

    timed("pyramid", upto_pyramid)
    timed("pyramid+feats+match", upto_match)
    timed("pyramid+feats+match+ransac10k", upto_ransac)
    timed("full_fused_align", full)


if __name__ == "__main__":
    main()
