"""Bisect the train-step cost by timing value_and_grad of partial losses.

Each variant runs K iterations inside one lax.scan (dev-tunnel timing
rules, CLAUDE.md). Components overlap (they share the feature trunk), so
read deltas, not sums.
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.train.losses import TRAIN_MODULES
    from ransacflow_tpu.train import local_index_roll, margin_mask
    from ransacflow_tpu.ops import normalized_grid
    from ransacflow_tpu.models.feature_extractor import feature_extractor
    from ransacflow_tpu.models.heads import (
        net_flow_coarse, net_matchability, flow_gradient_magnitude,
        flow_to_grid,
    )
    from ransacflow_tpu.models.layers import l2_normalize, cast_compute_params
    from ransacflow_tpu.ops.correlation import correlation_volume
    from ransacflow_tpu.ops.sampler import grid_sample
    from ransacflow_tpu.ops.ssim import masked_ssim_loss

    dtype = jnp.dtype(args.dtype)
    params = init_alignment_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b2 = 2 * args.batch
    images = jnp.asarray(rng.rand(b2, args.img, args.img, 3).astype(np.float32))
    roll = local_index_roll(args.batch)
    grid = normalized_grid(args.img, args.img)[None]
    mask = margin_mask(b2, args.img, 8)

    def stages(p, upto):
        """Forward through the shared trunk, then the component `upto`."""
        if dtype != jnp.float32:
            p = cast_compute_params(p, dtype)
        f, _ = feature_extractor(p["netFeatCoarse"], images, train=True)
        f = l2_normalize(f, axis=-1)
        if upto == "feat":
            return jnp.sum(f.astype(jnp.float32) ** 2)
        corr = correlation_volume(f[roll], f, 7)
        flow, _ = net_flow_coarse(p["netFlowCoarse"], corr, up8=True,
                                  kernel_size=7, train=True)
        flow = flow.astype(jnp.float32)
        if upto == "flow_head":
            return jnp.sum(flow ** 2)
        final = flow_to_grid(flow, grid)
        if upto == "gs_cycle":
            flow_c = grid_sample(final[roll], final)
            return jnp.sum(jnp.abs(flow_c - grid))
        if upto == "gs_recon":
            warped = grid_sample(images, final)
            return jnp.sum(warped)
        if upto == "ssim":
            warped = grid_sample(images, final)
            return masked_ssim_loss(warped, images[roll], mask)
        if upto == "match_cycle":
            match, _ = net_matchability(p["netMatch"], corr, up8=True,
                                        train=True)
            match = match.astype(jnp.float32) * mask
            mc = grid_sample(match[roll], final) * match
            return jnp.sum(mc)
        if upto == "flow_grad":
            fg = flow_gradient_magnitude(flow)
            return jnp.sum(fg)
        raise ValueError(upto)

    variants = ["feat", "flow_head", "gs_cycle", "gs_recon", "ssim",
                "match_cycle", "flow_grad"]

    def make_runner(upto, n):
        def one(p):
            g = jax.grad(lambda q: stages(q, upto))(p)
            return sum(jnp.sum(x) for x in jax.tree.leaves(g))

        @jax.jit
        def run(p):
            def body(c, _):
                return c, one(p)
            _, outs = jax.lax.scan(body, 0, None, length=n)
            return outs[-1]

        return run

    results = {}
    for upto in variants:
        r1 = make_runner(upto, 1)
        rn = make_runner(upto, args.iters)
        np.asarray(r1(params))
        np.asarray(rn(params))
        t0 = time.perf_counter()
        np.asarray(rn(params))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(r1(params))
        t1 = time.perf_counter() - t0
        ms = (tn - t1) / (args.iters - 1) * 1000.0
        results[upto] = round(ms, 1)
        print(f"{upto}: {ms:.1f} ms", flush=True)

    print(json.dumps({"bisect_ms": results, "dtype": args.dtype,
                      "batch": args.batch, "img": args.img}))


if __name__ == "__main__":
    main()
