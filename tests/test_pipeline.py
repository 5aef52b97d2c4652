"""End-to-end pipeline integration tests on synthetic pairs (CPU).

Untrained CNN features are shift-equivariant, so a cell-aligned translation
of a high-contrast texture is reliably trackable by the coarse matcher even
with random weights. Image borders are excluded from matching via the
exclusion-mask path (conv zero-padding gives border cells position-locked
feature signatures that would otherwise vote for the identity transform —
an untrained-weights artifact that trained features overpower).
"""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image
import pytest

from ransacflow_tpu.models import init_resnet50_layer3
from ransacflow_tpu.ops import warp_grid, grid_sample, apply_homography
from ransacflow_tpu.pipeline import (
    CoarseAligner,
    RansacFlowAligner,
    init_alignment_params,
    multi_homography_predict,
)

H_IMG = W_IMG = 256
BORDER = 48


def _blocky_image(rng, h, w):
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    img = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
    return Image.fromarray((img * 255).astype(np.uint8))


def _translated_pair(rng, dx_px=32, dy_px=16):
    """Source + target with H_true = normalized translation (target->source)."""
    src = _blocky_image(rng, H_IMG, W_IMG)
    tx, ty = 2 * dx_px / W_IMG, 2 * dy_px / H_IMG
    H_true = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
    src_arr = np.asarray(src, np.float32) / 255.0
    g = warp_grid(jnp.asarray(H_true)[None], H_IMG, W_IMG)
    tgt_arr = np.asarray(grid_sample(jnp.asarray(src_arr)[None], g))[0]
    tgt = Image.fromarray((np.clip(tgt_arr, 0, 1) * 255).astype(np.uint8))
    return src, tgt, H_true


def _border_mask():
    m = np.ones((H_IMG, W_IMG), np.float32)
    m[BORDER:-BORDER, BORDER:-BORDER] = 0
    return m


@pytest.fixture(scope="module")
def resnet_params():
    return init_resnet50_layer3(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def align_params():
    return init_alignment_params(jax.random.PRNGKey(1))


def _h_error(H_est, H_true, n=64):
    rng = np.random.RandomState(0)
    pts = rng.rand(n, 2) * 1.2 - 0.6
    a = np.asarray(apply_homography(jnp.asarray(np.asarray(H_est, np.float32)),
                                    jnp.asarray(pts.astype(np.float32))))
    b = np.asarray(apply_homography(jnp.asarray(H_true), jnp.asarray(pts.astype(np.float32))))
    return np.abs(a - b).mean()


def test_coarse_aligner_recovers_translation(rng, resnet_params):
    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=3000,
                           min_size=H_IMG)
    coarse.set_pair(src, tgt)
    assert coarse.num_cached_matches > 20
    H, inlier = coarse.get_coarse(_border_mask())
    assert H is not None
    assert _h_error(H, H_true) < 0.02
    assert inlier.shape == (coarse.feat_h, coarse.feat_w)
    assert inlier.sum() >= 20


def test_coarse_aligner_adaptive_mode(rng, resnet_params):
    """adaptive_chunk engages the confidence early-exit RANSAC on BOTH
    CoarseAligner entry points: get_coarse still recovers the planted
    translation, and the async rotation-pre-test twin
    (dispatch_inlier_count) scores under the same adaptive mode (review
    fix: it previously stayed fixed-count, so --adaptiveChunk silently
    did not apply to the YFCC pre-test's dominant RANSAC cost)."""
    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=3000,
                           min_size=H_IMG, adaptive_chunk=512)
    coarse.set_pair(src, tgt)
    H, inlier = coarse.get_coarse(_border_mask())
    assert H is not None
    assert _h_error(H, H_true) < 0.02
    n = int(np.asarray(coarse.dispatch_inlier_count(
        _border_mask(), jax.random.PRNGKey(3))))
    assert n >= 20  # same alignable pair => same-order inlier count
    assert abs(n - float(inlier.sum())) <= max(5.0, 0.3 * inlier.sum())


def test_coarse_aligner_anchor_stride(rng, resnet_params):
    """anchor_stride on the host CoarseAligner (the CLI-reachable twin of
    pipeline/fused._coarse_match's opt-in fast mode, --anchorStride):
    anchor scales must reproduce the exact per-scale trunk output, and the
    approximated bank must still recover the planted translation."""
    from ransacflow_tpu.utils.image import (
        resize_min_size, to_array, STRIDE_NET,
    )

    src, tgt, H_true = _translated_pair(rng)
    # 5 scales with anchors {1.2, 1.0, 0.833} mirrors the serving geometry
    # (7 scales, stride 3, anchors {2.0, 1.0, 0.5}): scale 1.0 — the only
    # scale untrained features can match the unscaled target at — stays an
    # EXACT anchor; a layout that resamples it cannot recover the planted
    # transform with random weights (scale-crossing matches need training).
    kw = dict(nb_scale=5, n_iter=3000, min_size=H_IMG, scale_r=1.2)
    exact = CoarseAligner(resnet_params, **kw)
    fast = CoarseAligner(resnet_params, anchor_stride=2, **kw)
    exact.set_pair(src, tgt)
    fast.set_pair(src, tgt)

    # per-scale bank block sizes (rows are concatenated scale-by-scale)
    sizes = []
    for s in exact.scales:
        a = to_array(resize_min_size(src, int(exact.min_size * s)))
        sizes.append((a.shape[0] // STRIDE_NET) * (a.shape[1] // STRIDE_NET))
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    bank_e = np.asarray(exact._bank)
    bank_f = np.asarray(fast._bank)
    assert bank_f.shape == bank_e.shape
    for i in (0, 2, 4):  # anchors at stride 2 of the 5-scale pyramid
        blk = slice(offsets[i], offsets[i + 1])
        np.testing.assert_allclose(bank_f[blk], bank_e[blk],
                                   atol=1e-5, rtol=1e-5)
    # the resampled in-between scales differ from exact but stay unit-norm
    for i in (1, 3):
        mid = slice(offsets[i], offsets[i + 1])
        assert not np.allclose(bank_f[mid], bank_e[mid], atol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(bank_f[mid], axis=1), 1.0,
                                   atol=1e-4)

    assert fast.num_cached_matches > 20
    H, inlier = fast.get_coarse(_border_mask())
    assert H is not None
    assert _h_error(H, H_true) < 0.02

    # --relaxCells on the host path (the anchor mode's vote-splitting
    # repair, ops/matching.mutual_matching): cached matches are a superset
    # of the anchor-exact set and the fit still recovers the transform
    relaxed = CoarseAligner(resnet_params, anchor_stride=2, relax_cells=1,
                            **kw)
    relaxed.set_pair(src, tgt)
    assert relaxed.num_cached_matches >= fast.num_cached_matches
    va = np.asarray(fast._cached_valid)
    vr = np.asarray(relaxed._cached_valid)
    assert (vr | ~va).all()
    Hr, _ = relaxed.get_coarse(_border_mask())
    assert Hr is not None
    assert _h_error(Hr, H_true) < 0.02


def test_coarse_aligner_multiscale_and_rematch(rng, resnet_params):
    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=3, n_iter=3000,
                           min_size=H_IMG, scale_r=1.2, rematch_per_call=True)
    coarse.set_pair(src, tgt)
    H, _ = coarse.get_coarse(_border_mask())
    assert H is not None
    assert _h_error(H, H_true) < 0.03


def test_coarse_aligner_full_exclusion_returns_none(rng, resnet_params):
    src, tgt, _ = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=500,
                           min_size=H_IMG)
    coarse.set_pair(src, tgt)
    H, _ = coarse.get_coarse(np.ones((H_IMG, W_IMG), np.float32))
    assert H is None


def test_align_images_end_to_end(rng, resnet_params, align_params):
    src, tgt, H_true = _translated_pair(rng)
    aligner = RansacFlowAligner(
        align_params, resnet_params,
        nb_scale=1, n_iter=3000, min_size=H_IMG, resize_mode="min",
        rematch_per_call=False,
    )
    out = aligner.align_images(src, tgt, exclusion_mask=_border_mask())
    assert out["H21"] is not None
    assert _h_error(out["H21"], H_true) < 0.02
    ht, wt = out["target"].shape[:2]
    assert out["flow"].shape == (ht, wt, 2)
    assert out["match"].shape == (ht, wt)
    assert out["warped_fine"].shape == (ht, wt, 3)
    # in the valid overlap region the coarse warp must align almost exactly
    ov = np.s_[BORDER:-BORDER, BORDER:-BORDER]
    err_id = np.abs(out["target"] - np.asarray(aligner.coarse.src_array))[ov].mean()
    err_coarse = np.abs(out["target"] - out["warped_coarse"])[ov].mean()
    assert err_coarse < 0.02
    assert err_id > 0.1  # the pair was genuinely misaligned before


def test_multi_homography_loop(rng, resnet_params, align_params):
    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=2000,
                           min_size=H_IMG)
    coarse.set_pair(src, tgt)
    out = multi_homography_predict(
        coarse, align_params, max_coarse=2, mask_region_th=0.01,
        bg_mask=1.0 - _border_mask(),
    )
    assert out is not None
    n = out["coarse_h"].shape[0]
    assert 1 <= n <= 3
    h8, w8 = H_IMG // 8, W_IMG // 8
    assert out["fine_flow_down8"].shape == (n, h8, w8, 2)
    assert out["fine_match_down8"].shape == (n, h8, w8, 2)
    assert _h_error(out["coarse_h"][0], H_true) < 0.02


def test_coarse_aligner_deterministic_with_seed(rng, resnet_params):
    """Same seed -> identical H sequence (the reference seeds its KITTI run
    for reproducibility, evalKITTI/evaluation.py:182-183)."""
    src, tgt, _ = _translated_pair(rng)

    def run():
        c = CoarseAligner(resnet_params, nb_scale=1, n_iter=1000,
                          min_size=H_IMG, seed=1000)
        c.set_pair(src, tgt)
        h1, _ = c.get_coarse(_border_mask())
        h2, _ = c.get_coarse(_border_mask())
        return h1, h2

    a1, a2 = run()
    b1, b2 = run()
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)


def test_multi_homography_fused_matches_host_loop(rng, resnet_params,
                                                  align_params):
    """The device-resident loop finds the same geometry as the host loop
    (PRNG folds differ, so compare fitted H's, not bits)."""
    from ransacflow_tpu.pipeline import multi_homography_predict_fused

    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=2000,
                           min_size=H_IMG, polish_fp64=False)
    coarse.set_pair(src, tgt)
    host = multi_homography_predict(
        coarse, align_params, max_coarse=2, mask_region_th=0.01,
        bg_mask=1.0 - _border_mask(),
    )
    fused = multi_homography_predict_fused(
        coarse, align_params, max_coarse=2, mask_region_th=0.01,
        bg_mask=1.0 - _border_mask(),
    )
    assert host is not None and fused is not None
    assert _h_error(fused["coarse_h"][0], H_true) < 0.02
    assert _h_error(fused["coarse_h"][0], host["coarse_h"][0]) < 0.01
    assert fused["fine_flow_down8"].shape[1:] == host["fine_flow_down8"].shape[1:]
    assert fused["fine_match_down8"].shape[1:] == host["fine_match_down8"].shape[1:]
    # first-H fine outputs are driven by nearly-identical H21's
    d = np.abs(fused["fine_flow_down8"][0] - host["fine_flow_down8"][0])
    assert np.median(d) < 0.02


def test_multi_homography_fused_rematch_mode(rng, resnet_params,
                                             align_params):
    """The YFCC configuration (rematch_per_call=True: masked target
    features re-match against the bank every iteration) through the
    device-resident loop agrees with the host loop — guards the policy
    the eval_yfcc CLI activates."""
    from ransacflow_tpu.pipeline import multi_homography_predict_fused

    src, tgt, H_true = _translated_pair(rng)
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=2000,
                           min_size=H_IMG, polish_fp64=False,
                           rematch_per_call=True)
    coarse.set_pair(src, tgt)
    host = multi_homography_predict(
        coarse, align_params, max_coarse=2, mask_region_th=0.01,
        bg_mask=1.0 - _border_mask(),
    )
    fused = multi_homography_predict_fused(
        coarse, align_params, max_coarse=2, mask_region_th=0.01,
        bg_mask=1.0 - _border_mask(),
    )
    assert host is not None and fused is not None
    assert _h_error(fused["coarse_h"][0], H_true) < 0.02
    assert _h_error(fused["coarse_h"][0], host["coarse_h"][0]) < 0.01


def test_multi_homography_batch_matches_per_pair(rng, resnet_params,
                                                 align_params):
    """`_fused_multi_homo_batch` (one program for a stack of same-shape
    pairs — the bench/throughput path) is bit-identical to per-pair
    `_fused_multi_homo` calls with the same keys."""
    from ransacflow_tpu.pipeline.fine import fine_features
    from ransacflow_tpu.pipeline.multihomo import (
        _fused_multi_homo,
        _fused_multi_homo_batch,
    )

    pairs = [_translated_pair(rng, 32, 16), _translated_pair(rng, -24, 8)]
    bg = jnp.asarray(_border_mask())

    banks, featts, srcs_i, valids, mids, ffines = [], [], [], [], [], []
    coarse = CoarseAligner(resnet_params, nb_scale=1, n_iter=512,
                           min_size=H_IMG, polish_fp64=False)
    for src, tgt, _ in pairs:
        coarse.set_pair(src, tgt)
        banks.append(coarse._bank)
        featts.append(coarse._featt)
        srcs_i.append(coarse._cached_src)
        valids.append(coarse._cached_valid)
        mids.append(jnp.asarray(coarse.src_array)[None])
        ffines.append(fine_features(align_params,
                                    jnp.asarray(coarse.tgt_array)[None]))
    coords_a, coords_b = coarse._coordsA, coarse._coordsB
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    kw = dict(feat_h=coarse.feat_h, feat_w=coarse.feat_w, max_coarse=2,
              cycle_match=False, kernel_size=7, n_iter=512, n_points=4,
              transform="homography", rematch=False)

    batched = _fused_multi_homo_batch(
        align_params, jnp.stack(banks), jnp.stack(featts), coords_a,
        coords_b, jnp.stack(srcs_i), jnp.stack(valids), jnp.stack(mids),
        jnp.stack(ffines), jnp.stack([bg, bg]), keys, 0.05, 0.01, **kw,
    )
    for i in range(2):
        single = _fused_multi_homo(
            align_params, banks[i], featts[i], coords_a, coords_b,
            srcs_i[i], valids[i], mids[i], ffines[i], bg, keys[i],
            0.05, 0.01, **kw,
        )
        assert int(batched["count"][i]) == int(single["count"])
        np.testing.assert_array_equal(
            np.asarray(batched["hs"][i]), np.asarray(single["hs"]))
        np.testing.assert_array_equal(
            np.asarray(batched["flows"][i]), np.asarray(single["flows"]))
        np.testing.assert_array_equal(
            np.asarray(batched["matches"][i]), np.asarray(single["matches"]))


def test_multi_homography_fused_bf16_consistent_with_fp32(rng, resnet_params,
                                                          align_params):
    """bf16-cast params (weights define the compute dtype) through the
    device-resident multi-homography loop recover the same first homography
    as fp32: convs + the matching matmul run bf16 while coords / DLT / mask
    geometry stay fp32 (coordinate arrays never touch the cast). Guards the
    bf16 multi-homography throughput mode (scripts/bench_multihomo_dtype.py)
    the same way test_fused_bf16_mode_consistent_with_fp32 guards serving."""
    from ransacflow_tpu.models import cast_params
    from ransacflow_tpu.pipeline import multi_homography_predict_fused

    src, tgt, H_true = _translated_pair(rng)

    def run(params_r, params_a):
        coarse = CoarseAligner(params_r, nb_scale=1, n_iter=2000,
                               min_size=H_IMG, polish_fp64=False)
        coarse.set_pair(src, tgt)
        return multi_homography_predict_fused(
            coarse, params_a, max_coarse=2, mask_region_th=0.01,
            bg_mask=1.0 - _border_mask(),
        )

    out32 = run(resnet_params, align_params)
    out16 = run(cast_params(resnet_params, jnp.bfloat16),
                cast_params(align_params, jnp.bfloat16))
    assert out32 is not None and out16 is not None
    assert _h_error(out16["coarse_h"][0], H_true) < 0.02
    assert _h_error(out16["coarse_h"][0], out32["coarse_h"][0]) < 0.01
    # fine outputs come back fp32-castable and finite under bf16 compute
    f16 = np.asarray(out16["fine_flow_down8"], np.float32)
    assert np.isfinite(f16).all()
