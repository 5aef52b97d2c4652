"""Fused serving-path tests (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ransacflow_tpu.models import init_resnet50_layer3
from ransacflow_tpu.pipeline import init_alignment_params
from ransacflow_tpu.pipeline.fused import fused_align, fused_align_batch


@pytest.fixture(scope="module")
def nets():
    return (
        init_resnet50_layer3(jax.random.PRNGKey(0)),
        init_alignment_params(jax.random.PRNGKey(1)),
    )


def _batch(rng, k, h=64, w=64):
    pyramids = (
        jnp.asarray(rng.rand(k, 1, h, w, 3).astype(np.float32)),
        jnp.asarray(rng.rand(k, 1, h // 2, w // 2, 3).astype(np.float32)),
    )
    targets = jnp.asarray(rng.rand(k, 1, h, w, 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), k)
    return pyramids, targets, keys


def test_fused_align_single_pair(rng, nets):
    resnet, align = nets
    pyramids, targets, keys = _batch(rng, 1)
    out = fused_align(
        resnet, align, tuple(p[0] for p in pyramids), targets[0], keys[0],
        n_iter=256,
    )
    assert out["H21"].shape == (3, 3)
    assert out["flow"].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out["flow"])).all()


def test_fused_batch_modes_agree(rng, nets):
    resnet, align = nets
    pyramids, targets, keys = _batch(rng, 4)
    a = fused_align_batch(resnet, align, pyramids, targets, keys,
                          n_iter=256, batch_mode="scan")
    for mode in ("vmap", "hybrid", "chunk2", "chunkf2", "chunkv2"):
        b = fused_align_batch(resnet, align, pyramids, targets, keys,
                              n_iter=256, batch_mode=mode)
        np.testing.assert_allclose(np.asarray(a["H21"]), np.asarray(b["H21"]),
                                   atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(np.asarray(a["num_inliers"]),
                                   np.asarray(b["num_inliers"]), err_msg=mode)
        np.testing.assert_allclose(np.asarray(a["flow"]),
                                   np.asarray(b["flow"]), atol=1e-4,
                                   err_msg=mode)


def test_fused_bf16_mode_consistent_with_fp32(rng, nets):
    """bf16 compute (weights define dtype) recovers the same homography on
    a clearly-matchable pair: geometry stays fp32, convs/matmuls run bf16."""
    from ransacflow_tpu.models import cast_params
    from ransacflow_tpu.ops import warp_grid, grid_sample

    resnet, align = nets
    h = w = 128
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    src = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
    H_true = np.array([[1, 0, 0.25], [0, 1, 0.25], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H_true)[None], h, w)
    tgt = np.asarray(grid_sample(jnp.asarray(src)[None], g))[0]

    def run(dtype):
        pyr = (jnp.asarray(src, dtype)[None],)
        t = jnp.asarray(tgt, dtype)[None]
        r = cast_params(resnet, dtype)
        a = cast_params(align, dtype)
        return fused_align(r, a, pyr, t, jax.random.PRNGKey(0), n_iter=2000)

    out32 = run(jnp.float32)
    out16 = run(jnp.bfloat16)
    h32 = np.asarray(out32["H21"], np.float64)
    h16 = np.asarray(out16["H21"], np.float64)
    h32 /= h32[2, 2]
    h16 /= h16[2, 2]
    # identical geometry up to bf16 feature/matching jitter
    np.testing.assert_allclose(h16, h32, atol=0.05)
    assert int(out16["num_inliers"]) > 0


def test_fused_anchor_stride_pyramid(rng, nets):
    """anchor_stride (opt-in approximation: exact trunk at every k-th
    pyramid scale, neighbors derived by nearest-anchor feature resampling
    — pipeline/fused._coarse_match) must (a) keep anchor-scale features
    BIT-EXACT, (b) retain most of the exact mode's mutual matches, and
    (c) agree with the exact mode's fused homography on an alignable
    pair. (Absolute recovery of a planted H is NOT asserted: zero-padding
    border cells vote identity on the unmasked serving path with
    untrained weights — see tests/test_pipeline.py docstring; the bf16
    test above makes the same cross-mode-only comparison. The design
    record, incl. why an all-from-largest variant was rejected — match
    collapse at large resampling ratios — is in docs/PERFORMANCE.md.)"""
    from ransacflow_tpu.ops import warp_grid, grid_sample
    from ransacflow_tpu.pipeline.fused import _coarse_match, device_pyramid

    resnet, align = nets
    h = w = 128
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    src = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
    H_true = np.array([[1, 0, 0.25], [0, 1, 0.25], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H_true)[None], h, w)
    tgt = grid_sample(jnp.asarray(src)[None], g)

    # 5 scales, stride 2 -> anchors at indices 0, 2, 4; 1, 3 resampled
    shapes = [(int(h * s) // 16 * 16,) * 2
              for s in (2.0, 1.5, 1.0, 0.75, 0.5)]
    pyr = device_pyramid(jnp.asarray(src)[None], shapes)

    m1e, _, ve = _coarse_match(resnet, pyr, tgt)
    m1a, _, va = _coarse_match(resnet, pyr, tgt, anchor_stride=2)
    ve, va = np.asarray(ve), np.asarray(va)
    # (b) match-count retention and same-cell agreement on the overlap
    assert va.sum() >= 0.6 * ve.sum(), (va.sum(), ve.sum())
    both = ve & va
    same = np.all(np.isclose(np.asarray(m1e)[both], np.asarray(m1a)[both],
                             atol=1e-6), axis=1)
    assert same.mean() > 0.7, same.mean()

    # (c) fused homographies agree up to matching jitter
    hs = {}
    for stride in (0, 2):
        out = fused_align(resnet, align, pyr, tgt, jax.random.PRNGKey(0),
                          n_iter=2000, anchor_stride=stride)
        assert bool(out["found"]), f"anchor_stride={stride}"
        assert int(out["num_inliers"]) > 0
        hm = np.asarray(out["H21"], np.float64)
        hs[stride] = hm / hm[2, 2]
    np.testing.assert_allclose(hs[2], hs[0], atol=0.05)


def test_fused_anchor_relax_cells(rng, nets):
    """relax_cells=1 (the anchor mode's vote-splitting repair — accept a
    match when the back-match lands within 1 target cell,
    ops/matching.mutual_matching) must (a) be a strict superset of the
    anchor mode's exact-reciprocity matches, (b) recover match count on a
    pair where the anchor approximation loses matches, and (c) keep the
    fused homography in agreement with the exact-pyramid mode. Mechanism
    + full-size TPU quality table: docs/PERFORMANCE.md round-5 anchor
    section."""
    from ransacflow_tpu.ops import warp_grid, grid_sample
    from ransacflow_tpu.pipeline.fused import _coarse_match, device_pyramid

    resnet, align = nets
    h = w = 128
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    src = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
    H_true = np.array([[1, 0, 0.25], [0, 1, 0.25], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H_true)[None], h, w)
    tgt = grid_sample(jnp.asarray(src)[None], g)

    shapes = [(int(h * s) // 16 * 16,) * 2
              for s in (2.0, 1.5, 1.0, 0.75, 0.5)]
    pyr = device_pyramid(jnp.asarray(src)[None], shapes)

    _, _, ve = _coarse_match(resnet, pyr, tgt)
    _, _, va = _coarse_match(resnet, pyr, tgt, anchor_stride=2)
    _, _, vr = _coarse_match(resnet, pyr, tgt, anchor_stride=2,
                             relax_cells=1)
    ve, va, vr = np.asarray(ve), np.asarray(va), np.asarray(vr)
    assert (vr | ~va).all(), "relaxed must be a superset of anchor-exact"
    assert vr.sum() > va.sum(), (vr.sum(), va.sum())
    # the rescue claim: relaxed anchor matching reaches at least the
    # EXACT pyramid's match count (measured full-size: exceeds it)
    assert vr.sum() >= 0.95 * ve.sum(), (vr.sum(), ve.sum())

    # fused homography agreement across modes
    out0 = fused_align(resnet, align, pyr, tgt, jax.random.PRNGKey(0),
                       n_iter=2000)
    outr = fused_align(resnet, align, pyr, tgt, jax.random.PRNGKey(0),
                       n_iter=2000, anchor_stride=2, relax_cells=1)
    assert bool(outr["found"])
    h0 = np.asarray(out0["H21"], np.float64)
    hr = np.asarray(outr["H21"], np.float64)
    np.testing.assert_allclose(hr / hr[2, 2], h0 / h0[2, 2], atol=0.05)


def test_device_pyramid_close_to_pil(rng):
    """jax lanczos3 resize tracks PIL LANCZOS closely enough for feature
    matching (same kernel family, different edge handling details)."""
    from PIL import Image
    from ransacflow_tpu.pipeline.fused import device_pyramid

    arr = rng.rand(96, 128, 3).astype(np.float32)
    shapes = [(48, 64), (96, 128), (192, 256)]
    pyr = device_pyramid(jnp.asarray(arr)[None], shapes)
    for (h, w), out in zip(shapes, pyr):
        assert out.shape == (1, h, w, 3)
        pil = np.stack([
            np.asarray(Image.fromarray(arr[:, :, c], mode="F").resize(
                (w, h), resample=Image.LANCZOS))
            for c in range(3)
        ], axis=-1)
        diff = np.abs(np.asarray(out[0]) - pil)
        assert np.percentile(diff, 99) < 0.03, (h, w, diff.max())


def test_fused_align_gates_on_ransac_failure(rng, nets):
    """When RANSAC finds no model the serving path must not emit unflagged
    garbage (reference stops and returns None, utils/outil.py:145-146):
    H21/flows fall back to identity, matchability is zeroed, found=False.

    A target one feature-cell tall makes every match collinear, so all
    4-point homographies are degenerate and the det gate rejects them.
    """
    from ransacflow_tpu.ops.homography import warp_grid

    resnet_params, align_params = nets
    pyr = tuple(
        jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
        for (h, w) in [(32, 128), (16, 96), (16, 64)]
    )
    tgt = jnp.asarray(rng.rand(1, 16, 96, 3).astype(np.float32))
    out = fused_align(resnet_params, align_params, pyr, tgt,
                      jax.random.PRNGKey(2), n_iter=256)
    assert not bool(out["found"])
    assert int(out["num_inliers"]) == 0
    np.testing.assert_array_equal(np.asarray(out["H21"]), np.eye(3))
    assert float(jnp.max(jnp.abs(out["match"]))) == 0.0
    assert float(jnp.max(jnp.abs(out["match_down8"]))) == 0.0
    np.testing.assert_allclose(
        np.asarray(out["flow"]), np.asarray(warp_grid(jnp.eye(3)[None], 16, 96)),
        atol=1e-6,
    )
    # flow_down8 is a RESIDUAL (consumers compose clip(upsample(.) + grid)),
    # so its no-op fallback is zeros, not an identity grid
    assert float(jnp.max(jnp.abs(out["flow_down8"]))) == 0.0


def test_fused_adaptive_chunk_consistent_with_fixed(rng, nets):
    """adaptive_chunk on the serving path recovers the same homography on a
    clearly-matchable pair while capping (not fixing) the hypothesis count;
    different PRNG chunking => compare the fitted transform, not bits."""
    from ransacflow_tpu.ops import warp_grid, grid_sample

    resnet, align = nets
    h = w = 128
    base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
    src = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
    H_true = np.array([[1, 0, 0.25], [0, 1, 0.25], [0, 0, 1]], np.float32)
    g = warp_grid(jnp.asarray(H_true)[None], h, w)
    tgt = np.asarray(grid_sample(jnp.asarray(src)[None], g))[0]
    pyr = (jnp.asarray(src)[None],)
    t = jnp.asarray(tgt)[None]

    fx = fused_align(resnet, align, pyr, t, jax.random.PRNGKey(0),
                     n_iter=2048)
    ad = fused_align(resnet, align, pyr, t, jax.random.PRNGKey(0),
                     n_iter=2048, adaptive_chunk=512)
    assert bool(fx["found"]) and bool(ad["found"])
    np.testing.assert_allclose(np.asarray(fx["H21"]), np.asarray(ad["H21"]),
                               atol=0.05)
    # batch path accepts the flag too (scan + chunk modes share _ransac)
    k = 2
    pyrs = (jnp.stack([pyr[0]] * k),)
    ts = jnp.stack([t] * k)
    keys = jax.random.split(jax.random.PRNGKey(3), k)
    outs = fused_align_batch(resnet, align, pyrs, ts, keys, n_iter=1024,
                             batch_mode="chunk2", adaptive_chunk=512)
    assert np.asarray(outs["found"]).all()
