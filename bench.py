"""Headline benchmark: end-to-end coarse+fine alignment throughput at 480px.

Runs the fully-fused on-device pipeline (7-scale ResNet-50 coarse features,
dense mutual matching, 10k-hypothesis vectorized RANSAC, homography warp,
full fine stage with bidirectional correlation + flow/matchability heads)
over a batch of 480x640 pairs resident on device, and reports pairs/sec on
the local chip.

Inputs are staged on device before timing: the dev harness reaches the TPU
through a network tunnel whose ~25 MB/s host<->device link is not
representative of production PCIe attach, so untimed staging isolates the
alignment compute itself. One device->host sync closes the timed region.

Baseline (BASELINE.md): >50 pairs/sec on a v5e-8 => 6.25 pairs/sec/chip.
vs_baseline is measured single-chip throughput / 6.25 (the workload is
embarrassingly pair-parallel, SURVEY.md §2.9).
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: repeated bench runs skip the slow
# first-compile (set before importing jax)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

MIN_SIZE = 480
ASPECT = (480, 640)
N_PAIRS = 32  # amortizes the dev-tunnel dispatch+readback latency
N_ITER = 10000
BASELINE_PAIRS_PER_SEC_PER_CHIP = 50.0 / 8.0


def _round(x, ndigits):
    """round() that passes None (-> JSON null) through unchanged.

    Explicit None test — truthiness would turn a legitimate 0.0 measurement
    into an unrounded falsy passthrough (ADVICE r2)."""
    return None if x is None else round(x, ndigits)


def pyramid_shapes(min_size=MIN_SIZE, aspect=ASPECT, nb_scale=7, scale_r=2.0,
                   stride=16):
    from ransacflow_tpu.utils.image import scale_list

    h0, w0 = aspect
    shapes = []
    for s in scale_list(nb_scale, scale_r):
        m = int(min_size * s)
        # min-side resize: min side -> m, keep aspect, floor to stride
        scale = m / min(h0, w0)
        h = int(round(h0 * scale)) // stride * stride
        w = int(round(w0 * scale)) // stride * stride
        shapes.append((h, w))
    return shapes


def bench_multihomo(resnet_params, align_params, n_pairs=8, max_coarse=10,
                    related=False, adaptive_chunk=0, mask_region_th=0.01,
                    n_iter=50000, return_outs=False, anchor_stride=0):
    """Reference-shaped eval path: full multi-homography loop at the
    HPatches config (minSize 480, 7 scales, 50k RANSAC iters, maxCoarse 10,
    maskRegionTh 0.01, match12-only fine stage —
    reference evaluation/evalHpatch/evaluation.py:70-78).

    Uses the BATCHED device-resident loop (`_fused_multi_homo_batch`): one
    vmapped setup program + one loop program + one count readback for the
    whole batch. (The per-pair dispatch variant costs ~120 ms/pair of
    host/tunnel overhead on top of ~12 ms/iteration device compute.)

    related=True plants a genuinely-aligned pair (target = 16px-rolled
    source at target scale) so that, with acceptance-realistic weights
    (scripts/train_accept_weights.py), matchability saturates on the
    matched region, the Mask accumulator fills, and the loop takes its
    accept-driven exit instead of exhausting all slots.
    Returns (pairs_per_sec, avg_homographies).
    """
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.pipeline.fused import (
        device_pyramid, _bank_coords,
    )
    from ransacflow_tpu.pipeline.coarse import _coarse_feats
    from ransacflow_tpu.pipeline.fine import fine_features
    from ransacflow_tpu.pipeline.multihomo import _fused_multi_homo_batch
    from ransacflow_tpu.ops.matching import mutual_matching
    from ransacflow_tpu.ops.grid import feature_cell_coords

    shapes = pyramid_shapes()
    rng = np.random.RandomState(1)
    src_h, src_w = shapes[0]
    ht, wt = ASPECT[0] // 16 * 16, ASPECT[1] // 16 * 16

    # synthetic blocky pairs (trackable by untrained features)
    def blocky(h, w):
        base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
        return np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]

    if related:
        # src_h == 2*ht at the default config (scale_r=2 pyramid): a 2x
        # nearest-upsampled source whose mid-scale IS the unshifted target
        bases = [blocky(ht, wt) for _ in range(n_pairs)]
        srcs = [
            np.kron(b, np.ones((2, 2, 1), np.float32))[:src_h, :src_w]
            for b in bases
        ]
        tgts = [np.roll(b, (16, 16), axis=(0, 1)) for b in bases]
        sources = jnp.asarray(np.stack(srcs)[:, None])
        targets = jnp.asarray(np.stack(tgts)[:, None])
    else:
        sources = jnp.asarray(
            np.stack([blocky(src_h, src_w) for _ in range(n_pairs)])[:, None]
        )
        targets = jnp.asarray(
            np.stack([blocky(ht, wt) for _ in range(n_pairs)])[:, None]
        )
    bgs = jnp.ones((n_pairs, ht, wt), jnp.float32)
    fy, fx = ht // 16, wt // 16
    y, x = feature_cell_coords(fy, fx)
    coords_b = jnp.stack([x, y], axis=1)
    coords_a = _bank_coords(shapes)

    s2d = bool(os.environ.get("RANSACFLOW_BENCH_S2D"))

    def setup(source, target):
        pyr = device_pyramid(source, shapes)
        if anchor_stride:
            # anchor-stride bank (the opt-in approximation measured in
            # pipeline/fused._coarse_match / CoarseAligner anchor_stride)
            import math

            from ransacflow_tpu.models.resnet50 import (
                resnet50_layer3, imagenet_preprocess,
            )
            from ransacflow_tpu.models.layers import l2_normalize

            anchors = list(range(0, len(shapes), int(anchor_stride)))
            amaps = {}
            for i in anchors:
                f, _ = resnet50_layer3(
                    resnet_params, imagenet_preprocess(pyr[i]), stem_s2d=s2d)
                amaps[i] = f
            log_a = [0.5 * math.log(float(h * w)) for (h, w) in shapes]
            feats = []
            for j, (h, w) in enumerate(shapes):
                i = min(anchors, key=lambda a: abs(log_a[a] - log_a[j]))
                f0 = amaps[i]
                c = f0.shape[-1]
                fh, fw = h // 16, w // 16
                if (fh, fw) != tuple(f0.shape[1:3]):
                    f0 = jax.image.resize(f0, (1, fh, fw, c), "bilinear")
                feats.append(l2_normalize(f0, axis=-1).reshape(-1, c))
        else:
            feats = [_coarse_feats(resnet_params, im, stem_s2d=s2d)
                     for im in pyr]
        bank = jnp.concatenate(feats, axis=0)
        featt = _coarse_feats(resnet_params, target, stem_s2d=s2d)
        m = mutual_matching(bank.T, featt.T)
        featt_fine = fine_features(align_params, target)
        return (bank, featt, m.src_idx, m.valid, pyr[len(shapes) // 2],
                featt_fine)

    setup_v = jax.jit(jax.vmap(setup))
    keys = jax.random.split(jax.random.PRNGKey(7), n_pairs)

    def run(fetch=False):
        banks, featts, src_idx, valids, mids, ffines = setup_v(
            sources, targets
        )
        final = _fused_multi_homo_batch(
            align_params, banks, featts, coords_a, coords_b,
            src_idx, valids, mids, ffines, bgs, keys, 0.05, mask_region_th,
            feat_h=fy, feat_w=fx, max_coarse=max_coarse, cycle_match=False,
            kernel_size=7, n_iter=n_iter, n_points=4,
            transform="homography", rematch=False,
            adaptive_chunk=adaptive_chunk,
        )
        if fetch:  # full artifact readback (accept-sensitivity sweeps)
            return {k: np.asarray(v) for k, v in final.items()}
        # single sync closes the timed region
        return np.asarray(final["count"])

    counts = run()  # compile + warm
    elapsed = float("inf")
    for _ in range(3):  # best-of-3: the dev tunnel adds run-to-run jitter
        t0 = time.perf_counter()
        counts = run()
        elapsed = min(elapsed, time.perf_counter() - t0)
    if return_outs:
        return n_pairs / elapsed, float(np.mean(counts)), run(fetch=True)
    return n_pairs / elapsed, float(np.mean(counts))


def _probe_devices(timeout_s):
    """Fail fast when the device tunnel is unreachable.

    `jax.devices()` against a dead axon tunnel blocks indefinitely (no
    deadline in the dev harness), which would make a scheduled bench run
    hang opaquely. Enumerate devices on a daemon thread with a bounded
    wait and exit(1) with a diagnosis instead.
    """
    import sys
    import threading

    import jax

    # honor the JAX_PLATFORMS env var the same way the package's
    # import-time guard does (the host pre-sets jax_platforms
    # programmatically, which beats the env var): a JAX_PLATFORMS=cpu
    # smoke run must probe the CPU backend, not the tunnel
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    out = {}

    def enumerate_devices():
        out["devices"] = jax.devices()

    t = threading.Thread(target=enumerate_devices, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(
            f"bench.py: device enumeration did not complete within "
            f"{timeout_s:.0f}s — the TPU tunnel is unreachable; "
            f"no measurement taken",
            file=sys.stderr,
        )
        raise SystemExit(1)
    return out["devices"]


def main():
    devices = _probe_devices(float(os.environ.get(
        "RANSACFLOW_BENCH_DEVICE_TIMEOUT", "300")))
    import jax
    import jax.numpy as jnp
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.pipeline.fused import fused_align_batch

    resnet_params_f32 = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params_f32 = init_alignment_params(jax.random.PRNGKey(1))

    # bf16 throughput mode: weights define the compute dtype (conv2d casts
    # activations down), so this runs every conv + the matching matmul on
    # the MXU in bf16 while coords/RANSAC/grid math stay fp32.
    # Geometry consistency vs fp32 is covered by
    # tests/test_fused.py::test_fused_bf16_mode_consistent_with_fp32.
    # bf16 is the DEFAULT serving configuration since round 4 (measured
    # 47.5 vs 41.1 pairs/s with chunk2; scripts/bench_batch_modes.py).
    dtype = os.environ.get("RANSACFLOW_BENCH_DTYPE", "bfloat16")
    from ransacflow_tpu.models import cast_params

    if dtype != "float32":
        resnet_params = cast_params(resnet_params_f32, jnp.dtype(dtype))
        align_params = cast_params(align_params_f32, jnp.dtype(dtype))
    else:
        resnet_params = resnet_params_f32
        align_params = align_params_f32

    shapes = pyramid_shapes()
    rng = np.random.RandomState(0)

    # stage synthetic full-resolution pairs on device (untimed); the scale
    # pyramid itself is built ON DEVICE inside the timed region (lanczos3),
    # as a production pipeline would after a single H2D image transfer
    src_h, src_w = shapes[0]  # largest scale ~ original resolution
    sources = jnp.asarray(
        rng.rand(N_PAIRS, 1, src_h, src_w, 3).astype(np.float32)
    )
    targets = jnp.asarray(
        rng.rand(N_PAIRS, 1, ASPECT[0], ASPECT[1], 3).astype(np.float32)
    )
    keys = jax.random.split(jax.random.PRNGKey(2), N_PAIRS)

    from ransacflow_tpu.pipeline.fused import device_pyramid
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def build_pyramids(srcs):
        return jax.vmap(lambda s: device_pyramid(s, shapes))(srcs)

    # Batch-mode A/B (round 4, scripts/bench_batch_modes.py): 'chunk2' —
    # scan over chunks of 2 pairs with trunk+matching vmapped inside the
    # chunk, RANSAC+fine streamed — wins (fp32 42.5 vs scan 41.1; bf16
    # 47.5 vs scan 43.0: conv batching pays more once bf16 halves the
    # activation traffic). Full 'vmap' still loses badly (31.5-36.5): the
    # (pairs x matches x hypotheses) RANSAC intermediates blow up HBM.
    batch_mode = os.environ.get("RANSACFLOW_BENCH_MODE", "chunk2")

    # space-to-depth stem (exact conv1 rewrite): wins in the isolated trunk
    # bench (9.5 -> 7.25 ms for the 7-scale pyramid) but LOSES end-to-end in
    # this fused scan program (39.7 -> 31.8 pairs/s measured A/B: the input
    # relayout to 12 channels breaks the pyramid->preprocess->conv fusion).
    # Default off; RANSACFLOW_BENCH_S2D=1 to re-measure.
    stem_s2d = bool(os.environ.get("RANSACFLOW_BENCH_S2D"))

    def run(k):
        pyramids = build_pyramids(sources)
        out = fused_align_batch(
            resnet_params, align_params, pyramids, targets,
            jax.random.split(k, N_PAIRS), n_iter=N_ITER,
            batch_mode=batch_mode, stem_s2d=stem_s2d,
        )
        # one small device->host sync ends the timed region
        return np.asarray(out["num_inliers"])

    run(jax.random.PRNGKey(3))  # compile + warm
    elapsed = float("inf")
    for s in (4, 5, 6):  # best-of-3: the dev tunnel adds run-to-run jitter
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(s))
        elapsed = min(elapsed, time.perf_counter() - t0)

    pairs_per_sec = N_PAIRS / elapsed

    # MFU: analytic model FLOPs (convs + matmuls only; the gather-shaped
    # ops — grid_sample, upsampling, RANSAC sampling — are index-rate-bound
    # and contribute ~0 FLOPs, see utils/flops.py) against the chip's dense
    # peak. End-to-end serving MFU is honestly low: the workload is
    # gather/matching-heavy by design. Per-stage MFU comes from pairing
    # these per-stage FLOPs with scripts/bisect_fused.py stage times.
    from ransacflow_tpu.utils.flops import (
        fused_align_flops, peak_flops_per_chip,
    )

    stage_flops = fused_align_flops(shapes, ASPECT, n_iter=N_ITER)
    # peak_flops_per_chip returns None for unrecognized device kinds
    # (e.g. a CPU smoke run): report mfu_pct as null rather than compute
    # it against a fabricated peak
    peak_env = os.environ.get("RANSACFLOW_PEAK_FLOPS")
    peak = (float(peak_env) if peak_env
            else peak_flops_per_chip(devices[0].device_kind))
    mfu_pct = (None if peak is None
               else 100.0 * stage_flops["total"] * pairs_per_sec / peak)

    # fp32 'scan' comparability point: the configuration every pre-round-4
    # headline was recorded in (fp32 parity weights, sequential scan) —
    # keyed on (dtype, mode) so e.g. a float32/chunk2 run still emits it.
    if ((dtype, batch_mode) != ("float32", "scan")
            and not os.environ.get("RANSACFLOW_BENCH_SKIP_FP32")):
        def run_f32(k):
            pyramids = build_pyramids(sources)
            out = fused_align_batch(
                resnet_params_f32, align_params_f32, pyramids, targets,
                jax.random.split(k, N_PAIRS), n_iter=N_ITER,
                batch_mode="scan", stem_s2d=stem_s2d,
            )
            return np.asarray(out["num_inliers"])

        run_f32(jax.random.PRNGKey(3))
        el32 = float("inf")
        for s in (4, 5, 6):
            t0 = time.perf_counter()
            run_f32(jax.random.PRNGKey(s))
            el32 = min(el32, time.perf_counter() - t0)
        fp32_scan_pps = N_PAIRS / el32
    elif (dtype, batch_mode) == ("float32", "scan"):
        # the headline IS the fp32/scan measurement — emit it so the
        # cross-round comparability series has no hole (ADVICE r4)
        fp32_scan_pps = pairs_per_sec
    else:
        fp32_scan_pps = None

    # anchor-stride pyramid point (round 5, opt-in approximation): trunk
    # exact only at scales {2.0, 1.0, 0.5}, neighbors feature-resampled
    # (pipeline/fused._coarse_match) — the measured fast serving mode
    # (quality cost quantified in scripts/bench_anchor_pyramid.py +
    # docs/PERFORMANCE.md). NOT the headline: the headline stays the
    # reference-parity exact pyramid.
    if os.environ.get("RANSACFLOW_BENCH_SKIP_ANCHOR"):
        anchor_pps = None
    else:
        def run_anchor(k):
            pyramids = build_pyramids(sources)
            out = fused_align_batch(
                resnet_params, align_params, pyramids, targets,
                jax.random.split(k, N_PAIRS), n_iter=N_ITER,
                batch_mode=batch_mode, stem_s2d=stem_s2d, anchor_stride=3,
            )
            return np.asarray(out["num_inliers"])

        run_anchor(jax.random.PRNGKey(3))
        el_a = float("inf")
        for s in (4, 5, 6):
            t0 = time.perf_counter()
            run_anchor(jax.random.PRNGKey(s))
            el_a = min(el_a, time.perf_counter() - t0)
        anchor_pps = N_PAIRS / el_a

    # Worst case: untrained matchability never saturates, so every synthetic
    # pair exhausts all maxCoarse+1 homography slots (real HPatches pairs
    # accept 1-3). Also measure a representative 3-homography config.
    # Always fp32 params: keeps the multi-homography series comparable
    # across rounds (r2/r3 recorded it at fp32).
    if os.environ.get("RANSACFLOW_BENCH_SKIP_MULTIHOMO"):
        # None -> JSON null; float('nan') would print a literal NaN token,
        # which is not valid RFC-8259 JSON
        mh_pps = mh_avg_h = mh3_pps = mh3_avg_h = mh3_bf16_pps = None
        mh3_ad_pps = None
    else:
        mh_pps, mh_avg_h = bench_multihomo(resnet_params_f32,
                                           align_params_f32)
        mh3_pps, mh3_avg_h = bench_multihomo(resnet_params_f32,
                                             align_params_f32,
                                             max_coarse=2)
        # adaptive early-exit twin of the 3-homography point: same fp32
        # weights and loop, n_iter capped at 50k but confidence-stopped
        mh3_ad_pps, _ = bench_multihomo(resnet_params_f32,
                                        align_params_f32,
                                        max_coarse=2, adaptive_chunk=4096)
        # bf16 point on the 3-homography config: identical work (all
        # three slots fill under untrained matchability), +12% measured
        # (scripts/bench_multihomo_dtype.py, round 4); geometry
        # consistency is tested
        # (test_multi_homography_fused_bf16_consistent_with_fp32).
        # Separately skippable (ADVICE r4): it adds a 50k-iteration
        # compile+measure pass to every invocation on the tunnel host.
        if os.environ.get("RANSACFLOW_BENCH_SKIP_MH_BF16"):
            mh3_bf16_pps = None
        else:
            if dtype == "bfloat16":
                resnet_bf16, align_bf16 = resnet_params, align_params
            else:
                resnet_bf16 = cast_params(resnet_params_f32, jnp.bfloat16)
                align_bf16 = cast_params(align_params_f32, jnp.bfloat16)
            mh3_bf16_pps, _ = bench_multihomo(resnet_bf16, align_bf16,
                                              max_coarse=2)

    # Acceptance-realistic variant: trained weights whose matchability
    # saturates (scripts/train_accept_weights.py) on a genuinely-aligned
    # pair, so the loop exits via the accept/Mask dynamics
    # (reference evaluation/evalHpatch/evaluation.py:225-243) instead of
    # the exhausted worst case above.
    accept_path = os.environ.get(
        "RANSACFLOW_BENCH_ACCEPT_WEIGHTS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "scripts", "assets", "accept_weights.npz"),
    )
    if (os.path.exists(accept_path)
            and not os.environ.get("RANSACFLOW_BENCH_SKIP_MULTIHOMO")):
        from ransacflow_tpu.models import load_params_npz

        accept_params = load_params_npz(accept_path)
        mha_pps, mha_avg_h = bench_multihomo(
            resnet_params_f32, accept_params, related=True
        )
        # Confidence-based RANSAC early exit (round 5, opt-in mode;
        # ops/ransac.ransac_homography_adaptive): n_iter 50k becomes a CAP
        # — well-matched regions stop after ~one 4096-hypothesis block.
        # The reference's host-chunked RANSAC has no stopping rule
        # (utils/outil.py:136-160), so this series is a TPU-first beat,
        # not parity. Distributional parity is tested
        # (test_ransac_adaptive_distributional_parity).
        mha_ad_pps, mha_ad_avg_h = bench_multihomo(
            resnet_params_f32, accept_params, related=True,
            adaptive_chunk=4096,
        )
        # Composite fast-eval point (round 5): every opt-in lever at once
        # — bf16 compute + adaptive early exit + anchor-stride banks.
        # Measured 35.8 vs 21.0 fixed-fp32 (scripts/bench_fast_eval.py);
        # avg_h identical to the exact-bank bf16 adaptive run (1.62), so
        # the anchor bank preserves the accept/exit dynamics. Separately
        # skippable: one more 50k-iteration compile+measure pass.
        if os.environ.get("RANSACFLOW_BENCH_SKIP_MH_FAST"):
            mha_fast_pps = mha_fast_avg_h = None
        else:
            resnet_b = (resnet_params if dtype == "bfloat16"
                        else cast_params(resnet_params_f32, jnp.bfloat16))
            accept_b = cast_params(accept_params, jnp.bfloat16)
            mha_fast_pps, mha_fast_avg_h = bench_multihomo(
                resnet_b, accept_b, related=True, adaptive_chunk=4096,
                anchor_stride=3,
            )
    else:
        mha_pps = mha_avg_h = mha_ad_pps = mha_ad_avg_h = None
        mha_fast_pps = mha_fast_avg_h = None

    print(
        json.dumps(
            {
                "metric": "pairs_per_sec_coarse_fine_480px_single_chip",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(
                    pairs_per_sec / BASELINE_PAIRS_PER_SEC_PER_CHIP, 3
                ),
                "extra_metrics": {
                    "serving_config": f"{dtype}/{batch_mode}",
                    "fp32_scan_pairs_s": _round(fp32_scan_pps, 3),
                    "serving_anchor3_pairs_s": _round(anchor_pps, 3),
                    "mfu_pct": _round(mfu_pct, 2),
                    "model_gflops_per_pair": round(
                        stage_flops["total"] / 1e9, 2
                    ),
                    "stage_gflops": {
                        k: round(v / 1e9, 2)
                        for k, v in stage_flops.items() if k != "total"
                    },
                    "peak_tflops_assumed": _round(
                        None if peak is None else peak / 1e12, 1),
                    "multihomo_hpatches50k_maxcoarse_exhausted_pairs_s":
                        _round(mh_pps, 3),
                    "multihomo_exhausted_avg_homographies":
                        _round(mh_avg_h, 2),
                    "multihomo_hpatches50k_3homo_pairs_s":
                        _round(mh3_pps, 3),
                    "multihomo_3homo_vs_baseline_per_chip": _round(
                        None if mh3_pps is None
                        else mh3_pps / BASELINE_PAIRS_PER_SEC_PER_CHIP, 3
                    ),
                    "multihomo_hpatches50k_3homo_bf16_pairs_s":
                        _round(mh3_bf16_pps, 3),
                    "multihomo_hpatches50k_3homo_adaptive_pairs_s":
                        _round(mh3_ad_pps, 3),
                    "multihomo_accept_realistic_pairs_s": _round(mha_pps, 3),
                    "multihomo_accept_avg_homographies": _round(mha_avg_h, 2),
                    "multihomo_accept_adaptive_pairs_s":
                        _round(mha_ad_pps, 3),
                    "multihomo_accept_adaptive_avg_homographies":
                        _round(mha_ad_avg_h, 2),
                    "multihomo_accept_fast_pairs_s":
                        _round(mha_fast_pps, 3),
                    "multihomo_accept_fast_avg_homographies":
                        _round(mha_fast_avg_h, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
