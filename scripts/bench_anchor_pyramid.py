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

    def measure(resnet, align, mode, stride, relax=0):
        def run(k):
            pyr = build_j(sources)
            out = fused_align_batch(
                resnet, align, pyr, targets, jax.random.split(k, n),
                n_iter=bench.N_ITER, batch_mode=mode, anchor_stride=stride,
                relax_cells=relax)
            return np.asarray(out["num_inliers"])

        run(jax.random.PRNGKey(3))
        el = float("inf")
        for s in (4, 5, 6):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(s))
            el = min(el, time.perf_counter() - t0)
        return n / el

    speed_configs = () if os.environ.get("ANCHOR_QUALITY_ONLY") else (
        ("bf16/chunk2 (serving default)", jnp.bfloat16, "chunk2"),
        ("fp32/scan (comparability)", None, "scan"),
    )
    for label, dtype, mode in speed_configs:
        r = resnet_f32 if dtype is None else cast_params(resnet_f32, dtype)
        a = align_f32 if dtype is None else cast_params(align_f32, dtype)
        print(f"== {label}")
        for stride, relax in ((0, 0), (STRIDE, 0), (STRIDE, 1)):
            pps = measure(r, a, mode, stride, relax)
            name = "exact pyramid" if stride == 0 else \
                f"anchor_stride={stride}" + \
                (f"+relax{relax}" if relax else "")
            print(f"  {name}: {pps:.2f} pairs/s")

    # two-anchor blend PROTOTYPE (quality probe only): for non-anchor
    # scales, bilinearly resample BOTH bracketing anchors' pre-norm maps
    # and linearly interpolate in log-area before re-normalizing — does
    # retaining both localizations beat nearest-anchor at mid-gap ratios?
    import math
    from functools import partial
    import jax as _jax
    from ransacflow_tpu.models.resnet50 import (
        resnet50_layer3, imagenet_preprocess,
    )
    from ransacflow_tpu.models.layers import l2_normalize
    from ransacflow_tpu.ops.matching import mutual_matching
    from ransacflow_tpu.pipeline.fused import _bank_coords

    @partial(_jax.jit, static_argnames=("stride",))
    def blend_match(params, pyramid, target, stride):
        anchors = list(range(0, len(pyramid), stride))
        f_anchor = {
            i: resnet50_layer3(params, imagenet_preprocess(pyramid[i]))[0]
            for i in anchors
        }
        log_a = [0.5 * math.log(float(im.shape[1] * im.shape[2]))
                 for im in pyramid]
        feats = []
        for j in range(len(pyramid)):
            fh = pyramid[j].shape[1] // 16
            fw = pyramid[j].shape[2] // 16
            if j in f_anchor:
                f = f_anchor[j]
            else:
                below = [a for a in anchors if log_a[a] <= log_a[j]]
                above = [a for a in anchors if log_a[a] > log_a[j]]
                if below and above:
                    lo = max(below, key=lambda a: log_a[a])
                    hi = min(above, key=lambda a: log_a[a])
                    w_hi = ((log_a[j] - log_a[lo])
                            / (log_a[hi] - log_a[lo]))
                    c = f_anchor[lo].shape[-1]
                    f_lo = _jax.image.resize(
                        f_anchor[lo], (1, fh, fw, c), "bilinear")
                    f_hi = _jax.image.resize(
                        f_anchor[hi], (1, fh, fw, c), "bilinear")
                    f = (1.0 - w_hi) * f_lo + w_hi * f_hi
                else:
                    near = min(anchors,
                               key=lambda a: abs(log_a[a] - log_a[j]))
                    c = f_anchor[near].shape[-1]
                    f = _jax.image.resize(
                        f_anchor[near], (1, fh, fw, c), "bilinear")
            c = f.shape[-1]
            feats.append(l2_normalize(f, axis=-1).reshape(-1, c))
        bank = jnp.concatenate(feats, axis=0)
        coords_a = _bank_coords([im.shape[1:3] for im in pyramid])
        ft, _ = resnet50_layer3(params, imagenet_preprocess(target))
        ft = l2_normalize(ft, axis=-1).reshape(-1, ft.shape[-1])
        m = mutual_matching(bank.T, ft.T)
        ones = jnp.ones((m.src_idx.shape[0], 1), jnp.float32)
        m1 = jnp.concatenate([coords_a[m.src_idx], ones], axis=1)
        return m1, m.valid

    # quality probe: plant content at several true scale ratios (target =
    # base; source = base upsampled by the ratio, padded into the largest
    # pyramid shape) and compare mutual-match counts + same-cell agreement
    print(f"== match quality at planted scale ratios (fp32, "
          f"anchor_stride={STRIDE} vs exact; 'relax' = +relax_cells=1 "
          f"back-match reciprocity; 'blend' = two-anchor log-interp "
          f"prototype)")
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
        m1r, _, vr = _coarse_match(resnet_f32, pyr1, tgt1,
                                   anchor_stride=STRIDE, relax_cells=1)
        m1b, vb = blend_match(resnet_f32, pyr1, tgt1, STRIDE)
        ve, va, vb = np.asarray(ve), np.asarray(va), np.asarray(vb)
        vr = np.asarray(vr)
        both = ve & va
        same = np.all(np.isclose(np.asarray(m1e)[both],
                                 np.asarray(m1a)[both], atol=1e-6), axis=1)
        bothb = ve & vb
        sameb = np.all(np.isclose(np.asarray(m1e)[bothb],
                                  np.asarray(m1b)[bothb], atol=1e-6), axis=1)
        print(f"  ratio {ratio:.2f}: exact {int(ve.sum()):4d}  "
              f"anchor {int(va.sum()):4d}  "
              f"retention {va.sum() / max(ve.sum(), 1):.0%}  "
              f"same-cell {same.mean():.0%}  |  "
              f"relax {int(vr.sum()):4d}  "
              f"retention {vr.sum() / max(ve.sum(), 1):.0%}  |  "
              f"blend {int(vb.sum()):4d}  "
              f"retention {vb.sum() / max(ve.sum(), 1):.0%}  "
              f"same-cell {sameb.mean():.0%}")


if __name__ == "__main__":
    main()
