"""A/B the fused_align_batch batch modes on the serving bench workload.

Runs the bench.py headline configuration (32 pairs, 480px, 10k RANSAC
hypotheses) once per batch mode and prints one JSON line per mode, so the
scan-vs-chunk question (does batching the trunk convs across pairs lift
the ~30% MXU utilization without the HBM blowup that sank 'vmap'?) is a
single command:

    python scripts/bench_batch_modes.py [scan chunk2 chunk4 ...]

Inputs are staged and pyramids built exactly as bench.py does; each mode
gets a warm run before best-of-3 timing. Modes whose compile or run fails
report {"error": ...} instead of aborting the sweep.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ASPECT, N_ITER, N_PAIRS, pyramid_shapes  # noqa: E402

# CPU-smoke overrides (tests / dry runs): shrink the workload without
# touching the TPU defaults above
N_PAIRS = int(os.environ.get("RANSACFLOW_BENCH_PAIRS", N_PAIRS))
N_ITER = int(os.environ.get("RANSACFLOW_BENCH_NITER", N_ITER))
_MIN_SIZE = int(os.environ.get("RANSACFLOW_BENCH_MINSIZE", 0))

DEFAULT_MODES = ("scan", "chunk2", "chunk4", "chunk8", "chunkv2", "chunkv4",
                 "chunkf2", "chunkf4")


def main():
    modes = tuple(sys.argv[1:]) or DEFAULT_MODES

    from bench import _probe_devices

    _probe_devices(float(os.environ.get(
        "RANSACFLOW_BENCH_DEVICE_TIMEOUT", "300")))

    import jax
    import jax.numpy as jnp

    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import device_pyramid, fused_align_batch

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))

    dtype = os.environ.get("RANSACFLOW_BENCH_DTYPE", "float32")
    if dtype != "float32":
        from ransacflow_tpu.models import cast_params

        resnet_params = cast_params(resnet_params, jnp.dtype(dtype))
        align_params = cast_params(align_params, jnp.dtype(dtype))

    if _MIN_SIZE:
        aspect = (_MIN_SIZE, int(_MIN_SIZE * 4 / 3) // 16 * 16)
        shapes = pyramid_shapes(min_size=_MIN_SIZE, aspect=aspect)
    else:
        aspect = ASPECT
        shapes = pyramid_shapes()
    rng = np.random.RandomState(0)
    src_h, src_w = shapes[0]
    sources = jnp.asarray(
        rng.rand(N_PAIRS, 1, src_h, src_w, 3).astype(np.float32)
    )
    targets = jnp.asarray(
        rng.rand(N_PAIRS, 1, aspect[0], aspect[1], 3).astype(np.float32)
    )

    @jax.jit
    def build_pyramids(srcs):
        return jax.vmap(lambda s: device_pyramid(s, shapes))(srcs)

    for mode in modes:
        def run(k):
            pyramids = build_pyramids(sources)
            out = fused_align_batch(
                resnet_params, align_params, pyramids, targets,
                jax.random.split(k, N_PAIRS), n_iter=N_ITER,
                batch_mode=mode,
            )
            return np.asarray(out["num_inliers"])

        try:
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(3))  # compile + warm
            warm_s = time.perf_counter() - t0
            elapsed = float("inf")
            for s in (4, 5, 6):
                t0 = time.perf_counter()
                run(jax.random.PRNGKey(s))
                elapsed = min(elapsed, time.perf_counter() - t0)
            print(json.dumps({
                "mode": mode,
                "pairs_per_sec": round(N_PAIRS / elapsed, 3),
                "best_s": round(elapsed, 3),
                "warm_s": round(warm_s, 1),
                "dtype": dtype,
            }), flush=True)
        except Exception as e:  # keep sweeping the remaining modes
            print(json.dumps({"mode": mode, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
