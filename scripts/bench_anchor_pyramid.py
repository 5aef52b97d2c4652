"""A/B the anchor-stride feature pyramid on the real chip.

The exact serving path runs ResNet-50 over every pyramid scale (~11x the
base pixel count, the measured dominant cost — docs/PERFORMANCE.md
"Where the time actually goes"); anchor_stride=3 runs the trunk at the
anchors {2.0, 1.0, 0.5} (~5.25x) and derives the in-between scales by
nearest-anchor bilinear feature resampling (pipeline/fused._coarse_match).
Measures end-to-end serving throughput under the bf16/chunk2 default and
the fp32/scan comparability config, THEN the match-quality cost at
planted scale ratios spanning the pyramid — speed is never quoted
without its quality cost. (The all-from-largest variant measured first
collapsed matching — 984 -> 149 mutual matches at a 4x resampling ratio —
and was rejected; this harness exists to keep that check attached to the
speed number.)

Usage:  timeout 2400 python scripts/bench_anchor_pyramid.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402  (sets the compilation-cache env vars)

STRIDE = int(os.environ.get("ANCHOR_STRIDE", "3"))


def main():
    bench._probe_devices(300.0)
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import init_resnet50_layer3, cast_params
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import (
        _coarse_match,
        device_pyramid,
        fused_align_batch,
    )

    resnet_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_f32 = init_alignment_params(jax.random.PRNGKey(1))

    shapes = bench.pyramid_shapes()
    rng = np.random.RandomState(0)
    src_h, src_w = shapes[0]
    n = bench.N_PAIRS
    ht, wt = bench.ASPECT
    sources = jnp.asarray(rng.rand(n, 1, src_h, src_w, 3).astype(np.float32))
    targets = jnp.asarray(rng.rand(n, 1, ht, wt, 3).astype(np.float32))

    build_j = jax.jit(
        lambda srcs: jax.vmap(lambda s: device_pyramid(s, shapes))(srcs))

    def measure(resnet, align, mode, stride):
        def run(k):
            pyr = build_j(sources)
            out = fused_align_batch(
                resnet, align, pyr, targets, jax.random.split(k, n),
                n_iter=bench.N_ITER, batch_mode=mode, anchor_stride=stride)
            return np.asarray(out["num_inliers"])

        run(jax.random.PRNGKey(3))
        el = float("inf")
        for s in (4, 5, 6):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(s))
            el = min(el, time.perf_counter() - t0)
        return n / el

    for label, dtype, mode in (
        ("bf16/chunk2 (serving default)", jnp.bfloat16, "chunk2"),
        ("fp32/scan (comparability)", None, "scan"),
    ):
        r = resnet_f32 if dtype is None else cast_params(resnet_f32, dtype)
        a = align_f32 if dtype is None else cast_params(align_f32, dtype)
        print(f"== {label}")
        for stride in (0, STRIDE):
            pps = measure(r, a, mode, stride)
            name = "exact pyramid" if stride == 0 else \
                f"anchor_stride={stride}"
            print(f"  {name}: {pps:.2f} pairs/s")

    # quality probe: plant content at several true scale ratios (target =
    # base; source = base upsampled by the ratio, padded into the largest
    # pyramid shape) and compare mutual-match counts + same-cell agreement
    print(f"== match quality at planted scale ratios (fp32, "
          f"anchor_stride={STRIDE} vs exact)")
    base = np.kron((rng.rand(ht // 4, wt // 4, 3) > 0.5).astype(np.float32),
                   np.ones((4, 4, 1), np.float32))[:ht, :wt]
    tgt1 = jnp.asarray(np.roll(base, (16, 16), (0, 1)))[None]
    for ratio in (1.0, 4 / 3, 5 / 3, 2.0):
        sh = int(ht * ratio) // 16 * 16
        sw = int(wt * ratio) // 16 * 16
        core = np.asarray(jax.image.resize(
            jnp.asarray(base), (sh, sw, 3), "lanczos3"))
        src = np.zeros((src_h, src_w, 3), np.float32)
        src[:sh, :sw] = core[:src_h, :src_w]
        pyr1 = device_pyramid(jnp.asarray(src)[None], shapes)
        m1e, _, ve = _coarse_match(resnet_f32, pyr1, tgt1)
        m1a, _, va = _coarse_match(resnet_f32, pyr1, tgt1,
                                   anchor_stride=STRIDE)
        ve, va = np.asarray(ve), np.asarray(va)
        both = ve & va
        same = np.all(np.isclose(np.asarray(m1e)[both],
                                 np.asarray(m1a)[both], atol=1e-6), axis=1)
        print(f"  ratio {ratio:.2f}: exact {int(ve.sum()):4d}  "
              f"anchor {int(va.sum()):4d}  "
              f"retention {va.sum() / max(ve.sum(), 1):.0%}  "
              f"same-cell {same.mean():.0%}")


if __name__ == "__main__":
    main()
