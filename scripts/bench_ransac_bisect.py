"""Bisect ransac_homography's cost on TPU: sampling+DLT vs scoring.

At the HPatches multihomo config (N=1200 target cells, 50k hypotheses)
RANSAC is the dominant per-iteration cost (6.1 ms of ~8.2,
scripts/bisect_multihomo.py). This times the full op and its two halves
to aim the optimization. K reps inside one lax.scan jit (dev-tunnel
timing rules).

Usage: python scripts/bench_ransac_bisect.py [--iters 8] [--n_iter 50000]
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
    ap.add_argument("--n_matches", type=int, default=1200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.ops.ransac import (
        ransac_homography, _sample_minimal_sets,
    )
    from ransacflow_tpu.ops.homography import dlt_homography

    N = args.n_matches
    rng = np.random.RandomState(0)
    pts = rng.rand(N, 2).astype(np.float32) * 2 - 1
    m1 = jnp.asarray(np.concatenate([pts + 0.1, np.ones((N, 1), np.float32)],
                                    axis=1))
    m2 = jnp.asarray(np.concatenate([pts, np.ones((N, 1), np.float32)],
                                    axis=1))
    valid = jnp.ones((N,), bool)
    tol = 0.05

    def timed(name, fn):
        def make(n):
            @jax.jit
            def run(key):
                def body(c, i):
                    out = fn(jax.random.fold_in(key, i))
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
        t0 = time.perf_counter(); np.asarray(rn(jax.random.PRNGKey(1)))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r1(jax.random.PRNGKey(1)))
        t1 = time.perf_counter() - t0
        ms = (tn - t1) / (args.iters - 1) * 1000.0
        print(json.dumps({"stage": name, "ms": round(ms, 2)}))
        return ms

    timed("full_ransac", lambda k: ransac_homography(
        k, m1, m2, valid, tol, n_iter=args.n_iter).num_inliers)

    def sample_dlt(k):
        raw, unique = _sample_minimal_sets(k, N, 4, args.n_iter)
        H = dlt_homography(m1[raw], m2[raw])
        return jnp.sum(H) + jnp.sum(unique)
    timed("sample_dlt", sample_dlt)

    def sample_only(k):
        raw, unique = _sample_minimal_sets(k, N, 4, args.n_iter)
        m12 = jnp.concatenate([m1, m2], axis=1)
        return jnp.sum(m12[raw]) + jnp.sum(unique)
    timed("sample_gather_only", sample_only)

    def dlt_only(k):
        # jitter the pre-gathered sets so the DLT chain can't be CSE'd
        X = m1[:4][None] + 1e-4 * jax.random.normal(k, (args.n_iter, 4, 3))
        Y = m2[:4][None] + 1e-4 * jax.random.normal(k, (args.n_iter, 4, 3))
        return jnp.sum(dlt_homography(X, Y))
    timed("dlt_only", dlt_only)

    def score_only(k):
        # fixed plausible H batch (identity + noise), same scoring math
        H = (jnp.eye(3)[None]
             + 0.01 * jax.random.normal(k, (args.n_iter, 3, 3)))
        ex = jnp.dot(m2, H[:, 0, :].T, preferred_element_type=jnp.float32)
        ey = jnp.dot(m2, H[:, 1, :].T, preferred_element_type=jnp.float32)
        ez = jnp.dot(m2, H[:, 2, :].T, preferred_element_type=jnp.float32)
        du = ex / ez - m1[:, 0:1]
        dv = ey / ez - m1[:, 1:2]
        hit = (du * du + dv * dv < tol * tol) & valid[:, None]
        return jnp.sum(hit, axis=0).astype(jnp.int32)
    timed("score_only", score_only)


if __name__ == "__main__":
    main()
