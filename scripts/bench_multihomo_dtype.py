"""A/B the multi-homography eval path's compute dtype.

The serving path's round-4 measurement (scripts/bench_batch_modes.py)
showed bf16 weights buy +10% once the trunk convs are MXU-limited; the
multi-homography bench series (`bench.bench_multihomo`) has so far only
been recorded at fp32. This harness measures the identical batched
device-resident loop with fp32 params vs bf16-cast params (weights carry
the compute dtype — conv2d casts activations down; coords/RANSAC/DLT
geometry stays fp32 because the coordinate arrays never touch the cast,
same mechanism as the serving path's tested bf16 mode).

Run on the TPU:

    python scripts/bench_multihomo_dtype.py [exhausted|3homo|accept] ...

Default: all three configs, fp32 + bf16 each.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    configs = sys.argv[1:] or ["exhausted", "3homo", "accept"]

    bench._probe_devices(
        float(os.environ.get("RANSACFLOW_BENCH_DEVICE_TIMEOUT", "300")))
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import cast_params, init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_f32 = init_alignment_params(jax.random.PRNGKey(1))
    accept_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "assets", "accept_weights.npz")

    def params_for(cfg, dtype):
        if cfg == "accept":
            from ransacflow_tpu.models import load_params_npz

            align = load_params_npz(accept_path)
        else:
            align = align_f32
        if dtype == "bfloat16":
            return (cast_params(resnet_f32, jnp.bfloat16),
                    cast_params(align, jnp.bfloat16))
        return resnet_f32, align

    kwargs = {
        "exhausted": dict(),
        "3homo": dict(max_coarse=2),
        "accept": dict(related=True),
    }
    for cfg in configs:
        if cfg == "accept" and not os.path.exists(accept_path):
            print(f"{cfg}: skipped (no {accept_path})")
            continue
        for dtype in ("float32", "bfloat16"):
            rp, ap = params_for(cfg, dtype)
            pps, avg_h = bench.bench_multihomo(rp, ap, **kwargs[cfg])
            print(f"{cfg:10s} {dtype:9s} {pps:7.3f} pairs/s  "
                  f"avg_homographies={avg_h:.2f}", flush=True)


if __name__ == "__main__":
    main()
