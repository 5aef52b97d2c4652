"""Train-step wall-clock on the local TPU chip.

Times K optimizer steps inside one `lax.scan` jit (the dev tunnel's ~50 ms
RTT makes per-step host timing useless), warming both trip-count variants
before reading numbers (CLAUDE.md environment notes). Reports ms/step for
the stage-3 config (flow+match+grad losses) at B pairs of `img`^2 crops.

Usage: python scripts/bench_train.py [--batch 16] [--img 224] [--iters 10]
                                     [--dtype float32|bfloat16]
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
    ap.add_argument("--batch", type=int, default=16, help="pairs per step")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--mode", default="flow+match")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.train import (
        make_train_step,
        local_index_roll,
        margin_mask,
    )
    from ransacflow_tpu.ops import normalized_grid

    kwargs = {}
    if args.dtype != "float32":
        kwargs["compute_dtype"] = args.dtype
    if args.remat:
        kwargs["remat"] = True

    params = init_alignment_params(jax.random.PRNGKey(0))
    init_opt, step = make_train_step(
        mode=args.mode, mu_cycle=1.0, lambda_match=0.01, grad_weight=1.0,
        **kwargs,
    )
    opt_state = init_opt(params)

    rng = np.random.RandomState(0)
    b2 = 2 * args.batch
    images = jnp.asarray(rng.rand(b2, args.img, args.img, 3).astype(np.float32))
    roll = local_index_roll(args.batch)
    grid = normalized_grid(args.img, args.img)[None]
    mask = margin_mask(b2, args.img, 8)

    def make_runner(n):
        @jax.jit
        def run(params, opt_state, images):
            def body(carry, _):
                p, o = carry
                p, o, m = step(p, o, images, roll, grid, mask)
                return (p, o), m["loss"]

            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n
            )
            return losses[-1]

        return run

    r1 = make_runner(1)
    rn = make_runner(args.iters)
    # warm both trip counts (separate compiles), force readback to sync
    np.asarray(r1(params, opt_state, images))
    np.asarray(rn(params, opt_state, images))

    t0 = time.perf_counter()
    loss_n = float(np.asarray(rn(params, opt_state, images)))
    t_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(r1(params, opt_state, images)))
    t_1 = time.perf_counter() - t0

    ms_per_step = (t_n - t_1) / (args.iters - 1) * 1000.0
    print(json.dumps({
        "metric": f"train_step_ms_B{args.batch}_{args.img}px_{args.dtype}" + ("_remat" if args.remat else ""),
        "value": round(ms_per_step, 2),
        "unit": "ms/step",
        "loss": round(loss_n, 4),
        "mode": args.mode,
    }))


if __name__ == "__main__":
    main()
