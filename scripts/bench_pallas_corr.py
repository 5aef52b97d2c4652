"""Measure the Pallas correlation kernel vs the XLA fusion on TPU.

VERDICT round-1 item 9: every Pallas kernel must carry a measured speedup
in its docstring or be deleted. Times `correlation_volume` both ways at the
fine-stage shape (features at stride 8 of a 480x640 pair, C from the fine
feature net), K reps inside one lax.scan jit (dev-tunnel timing rules).

Usage: python scripts/bench_pallas_corr.py [--iters 32]
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
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--h", type=int, default=60)
    ap.add_argument("--w", type=int, default=80)
    ap.add_argument("--c", type=int, default=None,
                    help="feature channels (default: fine feature net's)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fine import fine_features
    from ransacflow_tpu.ops.correlation import correlation_volume

    if args.c is None:
        params = init_alignment_params(jax.random.PRNGKey(0))
        f = fine_features(params, jnp.zeros((1, 64, 64, 3)))
        args.c = f.shape[-1]
    print(f"# shape (1, {args.h}, {args.w}, {args.c})")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.h, args.w, args.c).astype(np.float32))
    y = jnp.asarray(rng.rand(1, args.h, args.w, args.c).astype(np.float32))

    def timed(name, use_pallas):
        def make(n):
            @jax.jit
            def run(x, y):
                def body(c, _):
                    out = correlation_volume(c[0], c[1], 7,
                                             use_pallas=use_pallas)
                    # rotate inputs through the output to defeat CSE
                    return (c[0] + 0 * out[..., :1], c[1]), jnp.sum(out)
                _, sums = jax.lax.scan(body, (x, y), None, length=n)
                return sums[-1]
            return run

        r1, rn = make(1), make(args.iters)
        np.asarray(r1(x, y)); np.asarray(rn(x, y))
        t0 = time.perf_counter(); np.asarray(rn(x, y))
        tn = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r1(x, y))
        t1 = time.perf_counter() - t0
        ms = (tn - t1) / (args.iters - 1) * 1000.0
        print(json.dumps({"impl": name, "ms": round(ms, 3)}))
        return ms

    xla = timed("xla", False)
    pallas = timed("pallas", True)
    print(json.dumps({"speedup_pallas_vs_xla": round(xla / pallas, 3)}))


if __name__ == "__main__":
    main()
