"""Mutual matching + vectorized RANSAC behavior tests."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from ransacflow_tpu.ops import (
    mutual_matching,
    ransac_homography,
    apply_homography,
    feature_cell_coords,
)


def _torch_mutual(featA, featB):
    """Golden mutual matching, the reference's topk+scatter formulation
    (utils/outil.py:32-45) re-expressed."""
    score = torch.from_numpy(featA).t() @ torch.from_numpy(featB)
    maxDim0, maxDim0Index = score.topk(k=1, dim=0)
    maxDim1, maxDim1Index = score.topk(k=1, dim=1)
    keep0 = torch.zeros_like(score).scatter_(0, maxDim0Index, maxDim0)
    keep1 = torch.zeros_like(score).scatter_(1, maxDim1Index, maxDim1)
    keepIndex = ((keep0 * keep1) > 0).nonzero()
    return keepIndex[:, 0].numpy(), keepIndex[:, 1].numpy()


def test_mutual_matching_matches_torch(rng):
    featA = rng.randn(32, 50).astype(np.float32)
    featB = rng.randn(32, 40).astype(np.float32)
    featA /= np.linalg.norm(featA, axis=0, keepdims=True)
    featB /= np.linalg.norm(featB, axis=0, keepdims=True)
    gold_i, gold_j = _torch_mutual(featA, featB)
    res = mutual_matching(jnp.asarray(featA), jnp.asarray(featB))
    ours_j = np.nonzero(np.asarray(res.valid))[0]
    ours_i = np.asarray(res.src_idx)[ours_j]
    np.testing.assert_array_equal(np.sort(ours_j), np.sort(gold_j))
    pairs_gold = set(zip(gold_i.tolist(), gold_j.tolist()))
    pairs_ours = set(zip(ours_i.tolist(), ours_j.tolist()))
    assert pairs_gold == pairs_ours


def test_mutual_matching_respects_target_mask(rng):
    featA = rng.randn(16, 30).astype(np.float32)
    featB = rng.randn(16, 25).astype(np.float32)
    mask = np.ones(25, bool)
    mask[::3] = False
    res = mutual_matching(jnp.asarray(featA), jnp.asarray(featB),
                          validB=jnp.asarray(mask))
    assert not np.any(np.asarray(res.valid)[~mask])
    # masked columns == zeroed features, the reference's formulation
    featB_zeroed = featB * mask[None, :]
    gold_i, gold_j = _torch_mutual(featA, featB_zeroed)
    ours_j = np.nonzero(np.asarray(res.valid))[0]
    np.testing.assert_array_equal(np.sort(ours_j), np.sort(gold_j))


def test_mutual_matching_relax_cells(rng):
    """relax_cells (opt-in, the anchor-stride companion): accepts a pair
    when the back-match lands within the radius in TARGET CELLS instead of
    exact index reciprocity (ops/matching.py). Checks: (a) radius 0 is the
    exact semantics, (b) the relaxed valid set is a superset, (c) a planted
    vote-split — a near-duplicate bank row that steals the argmax and
    back-matches to the NEIGHBORING target cell — is dropped by exact
    reciprocity but rescued by relax_cells=1."""
    gh, gw = 5, 8
    nB = gh * gw
    featB = rng.randn(32, nB).astype(np.float32)
    featB /= np.linalg.norm(featB, axis=0, keepdims=True)
    # bank = copy of target features (so cell j matches row j) ...
    featA = featB.copy()
    res0 = mutual_matching(jnp.asarray(featA), jnp.asarray(featB))
    assert np.asarray(res0.valid).all()

    # ... plus one near-duplicate of row 20 biased toward cell 21 (the
    # horizontal neighbor): with the true row weakened it wins column 20's
    # argmax but back-matches 21 — the vote-split geometry the anchor
    # mode's resampled rows produce (docs/PERFORMANCE.md round-5 section)
    j, jn = 20, 21
    dup = 0.6 * featB[:, j] + 0.7 * featB[:, jn]
    dup /= np.linalg.norm(dup)
    featA2 = np.concatenate([featA, dup[:, None]], axis=1)
    featA2[:, j] *= 0.5  # weaken the true row so the dup steals the argmax
    exact = mutual_matching(jnp.asarray(featA2), jnp.asarray(featB))
    ev = np.asarray(exact.valid)
    # the dup must actually have stolen column j and split the vote
    assert int(np.asarray(exact.src_idx)[j]) == nB
    assert not ev[j], "planted vote-split was not dropped by exact mode"

    relaxed = mutual_matching(jnp.asarray(featA2), jnp.asarray(featB),
                              relax_cells=1, grid_w=gw)
    rv = np.asarray(relaxed.valid)
    assert rv[j], "relax_cells=1 must rescue the 1-cell vote-split"
    assert (rv | ~ev).all(), "relaxed valid set must be a superset"

    # radius 0 == exact semantics (relax_cells=0 ignores grid_w)
    res_r0 = mutual_matching(jnp.asarray(featA2), jnp.asarray(featB),
                             relax_cells=0, grid_w=gw)
    np.testing.assert_array_equal(np.asarray(res_r0.valid), ev)

    # Chebyshev radius is in CELLS: a back-match one ROW away (index
    # distance gw) is also within radius 1
    import pytest
    with pytest.raises(ValueError):
        mutual_matching(jnp.asarray(featA2), jnp.asarray(featB),
                        relax_cells=1)


def _make_ransac_problem(rng, n=300, inlier_frac=0.7, noise=0.003):
    H = np.eye(3) + rng.randn(3, 3) * 0.15
    H[2, :2] *= 0.1
    m2 = (rng.rand(n, 2) * 1.6 - 0.8).astype(np.float32)
    m1 = np.array(apply_homography(jnp.asarray(H.astype(np.float32)),
                                   jnp.asarray(m2)))
    n_out = int(n * (1 - inlier_frac))
    m1[:n_out] = rng.rand(n_out, 2) * 2 - 1  # outliers
    m1 += rng.randn(n, 2).astype(np.float32) * noise
    ones = np.ones((n, 1), np.float32)
    return (np.concatenate([m1, ones], 1), np.concatenate([m2, ones], 1),
            H, n_out)


def test_ransac_finds_dominant_homography(rng):
    m1, m2, H, n_out = _make_ransac_problem(rng)
    valid = np.ones(len(m1), bool)
    res = ransac_homography(
        jax.random.PRNGKey(0), jnp.asarray(m1), jnp.asarray(m2),
        jnp.asarray(valid), tolerance=0.05, n_iter=2000)
    assert bool(res.found)
    n_inl = int(res.num_inliers)
    assert n_inl > 0.9 * (len(m1) - n_out)
    # the recovered H maps target inliers onto source points
    inl = np.asarray(res.inlier_mask)
    est = np.asarray(apply_homography(res.H21, jnp.asarray(m2[inl, :2])))
    err = np.linalg.norm(est - m1[inl, :2], axis=1)
    assert err.max() < 0.05


def test_ransac_ignores_padded_matches(rng):
    m1, m2, H, n_out = _make_ransac_problem(rng, n=200)
    pad = 100
    m1p = np.concatenate([m1, np.full((pad, 3), 5.0, np.float32)])
    m2p = np.concatenate([m2, np.full((pad, 3), -5.0, np.float32)])
    valid = np.concatenate([np.ones(200, bool), np.zeros(pad, bool)])
    res = ransac_homography(
        jax.random.PRNGKey(1), jnp.asarray(m1p), jnp.asarray(m2p),
        jnp.asarray(valid), tolerance=0.05, n_iter=2000)
    assert bool(res.found)
    assert not np.any(np.asarray(res.inlier_mask)[200:])
    # padding position must not change the result given identical valid set
    res2 = ransac_homography(
        jax.random.PRNGKey(1), jnp.asarray(m1), jnp.asarray(m2),
        jnp.asarray(np.ones(200, bool)), tolerance=0.05, n_iter=2000)
    np.testing.assert_allclose(np.asarray(res.H21), np.asarray(res2.H21),
                               atol=1e-6)


def test_ransac_not_found_on_degenerate_input():
    m1 = jnp.zeros((10, 3)).at[:, 2].set(1.0)
    m2 = jnp.zeros((10, 3)).at[:, 2].set(1.0)
    valid = jnp.zeros(10, bool).at[:3].set(True)  # < 4 valid points
    res = ransac_homography(jax.random.PRNGKey(0), m1, m2, valid,
                            tolerance=0.05, n_iter=100)
    assert not bool(res.found)


def test_ransac_affine_mode(rng):
    A = np.array([[1.1, 0.05, 0.2], [-0.03, 0.9, -0.1], [0, 0, 1]], np.float32)
    m2 = (rng.rand(150, 2) * 1.6 - 0.8).astype(np.float32)
    m1 = np.asarray(apply_homography(jnp.asarray(A), jnp.asarray(m2)))
    ones = np.ones((150, 1), np.float32)
    res = ransac_homography(
        jax.random.PRNGKey(0),
        jnp.asarray(np.concatenate([m1, ones], 1)),
        jnp.asarray(np.concatenate([m2, ones], 1)),
        jnp.ones(150, dtype=bool), tolerance=0.05, n_iter=500,
        n_points=3, transform="affine")
    assert bool(res.found)
    Hn = np.asarray(res.H21)
    np.testing.assert_allclose(Hn, A, atol=1e-2)


def test_feature_cell_coords_match_reference_formula():
    y, x = feature_cell_coords(3, 4)
    # reference getWHTensor: ((idx + 0.5)/size - 0.5) * 2, rows vary slowest
    gold_y = (((np.repeat(np.arange(3), 4) + 0.5) / 3) - 0.5) * 2
    gold_x = (((np.tile(np.arange(4), 3) + 0.5) / 4) - 0.5) * 2
    np.testing.assert_allclose(np.asarray(y), gold_y, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x), gold_x, atol=1e-6)


def _numpy_reference_ransac(samples, m1, m2, tolerance):
    """The reference's scoring semantics (utils/outil.py:102-113) in pure
    numpy fp64: batched DLT via SVD null vector, det > 1e-6 gate (absolute
    value here, see ops/ransac.py docstring), inlier counting."""
    from ransacflow_tpu.ops.homography import dlt_homography_np

    best_h, best_count, counts = None, -1, []
    for s in samples:
        if len(set(s.tolist())) < 4:
            counts.append(0)
            continue
        H = dlt_homography_np(m1[s, :2], m2[s, :2])
        if abs(np.linalg.det(H)) <= 1e-6:
            counts.append(0)
            continue
        est = m2[:, :2] @ H[:2, :2].T + H[:2, 2]
        z = m2[:, :2] @ H[2, :2] + H[2, 2]
        est = est / z[:, None]
        err = np.sqrt(((m1[:, :2] - est) ** 2).sum(1))
        counts.append(int((err < tolerance).sum()))
    return np.array(counts)


def test_ransac_injected_samples_match_reference_semantics(rng):
    """Deterministic parity mode: identical minimal sets -> the winner and
    its inlier count agree with a fp64 numpy implementation of the
    reference scoring."""
    m1, m2, H, n_out = _make_ransac_problem(rng, n=120, noise=0.002)
    n_iter = 64
    samples = rng.randint(0, 120, (n_iter, 4)).astype(np.int32)
    res = ransac_homography(
        jax.random.PRNGKey(0), jnp.asarray(m1), jnp.asarray(m2),
        jnp.ones(120, bool), tolerance=0.05, n_iter=n_iter,
        injected_samples=jnp.asarray(samples),
    )
    gold_counts = _numpy_reference_ransac(samples, m1.astype(np.float64),
                                          m2.astype(np.float64), 0.05)
    # fp32 on-device vs fp64 numpy: counts match within a couple of
    # borderline correspondences per hypothesis
    assert int(res.num_inliers) >= gold_counts.max() - 2
    best = int(np.argmax(gold_counts))
    np.testing.assert_array_equal(np.asarray(res.best_sample),
                                  samples[np.argmax(gold_counts)])


def test_ransac_chunked_scoring_matches_oneshot(rng, monkeypatch):
    """Forcing the chunked scoring path gives identical winners."""
    from ransacflow_tpu.ops import ransac as R

    m1, m2, H, n_out = _make_ransac_problem(rng, n=150)
    valid = jnp.ones(150, bool)
    args = (jax.random.PRNGKey(0), jnp.asarray(m1), jnp.asarray(m2), valid)
    one = ransac_homography(*args, tolerance=0.05, n_iter=1000)
    monkeypatch.setattr(R, "SCORE_ELEMS_LIMIT", 10_000)  # ~67 hyps/chunk
    R.ransac_homography.clear_cache()
    chunked = R.ransac_homography(*args, tolerance=0.05, n_iter=1000)
    R.ransac_homography.clear_cache()
    assert int(one.num_inliers) == int(chunked.num_inliers)
    np.testing.assert_allclose(np.asarray(one.H21), np.asarray(chunked.H21),
                               atol=1e-6)


def test_ransac_adaptive_early_exit_on_clean_problem(rng):
    """70% inliers => confidence 0.999 needs ~25 draws; the adaptive loop
    must stop after ONE chunk and still recover the planted homography."""
    from ransacflow_tpu.ops import ransac_homography_adaptive

    m1, m2, H, n_out = _make_ransac_problem(rng)
    valid = jnp.ones(len(m1), bool)
    res, n_eval = ransac_homography_adaptive(
        jax.random.PRNGKey(0), jnp.asarray(m1), jnp.asarray(m2), valid,
        tolerance=0.05, n_iter=50000, chunk=1024)
    assert bool(res.found)
    assert int(n_eval) == 1024  # stopped after the first block, not 50k
    assert int(res.num_inliers) > 0.9 * (len(m1) - n_out)
    inl = np.asarray(res.inlier_mask)
    est = np.asarray(apply_homography(res.H21, jnp.asarray(m2[inl, :2])))
    err = np.linalg.norm(est - m1[inl, :2], axis=1)
    assert err.max() < 0.05


def test_ransac_adaptive_exhausts_without_structure(rng):
    """Unstructured matches never meet the confidence bound: every chunk up
    to the n_iter cap must be evaluated (regression for the fp32
    log(1 - w^4) == log(1.0) underflow that stopped after one chunk)."""
    from ransacflow_tpu.ops import ransac_homography_adaptive

    n = 300
    ones = np.ones((n, 1), np.float32)
    m1 = np.concatenate([rng.rand(n, 2) * 2 - 1, ones], 1).astype(np.float32)
    m2 = np.concatenate([rng.rand(n, 2) * 2 - 1, ones], 1).astype(np.float32)
    res, n_eval = ransac_homography_adaptive(
        jax.random.PRNGKey(1), jnp.asarray(m1), jnp.asarray(m2),
        jnp.ones(n, bool), tolerance=0.003, n_iter=4096, chunk=1024)
    assert int(n_eval) == 4096


def test_ransac_adaptive_not_found_on_degenerate_input():
    from ransacflow_tpu.ops import ransac_homography_adaptive

    m1 = jnp.zeros((10, 3)).at[:, 2].set(1.0)
    m2 = jnp.zeros((10, 3)).at[:, 2].set(1.0)
    valid = jnp.zeros(10, bool).at[:3].set(True)  # < 4 valid points
    res, _ = ransac_homography_adaptive(
        jax.random.PRNGKey(0), m1, m2, valid, tolerance=0.05,
        n_iter=1024, chunk=512)
    assert not bool(res.found)


def test_ransac_adaptive_distributional_parity(rng):
    """Early exit must not change WHAT is found, only how much work finds
    it: over seeds, adaptive inlier counts and fitted geometry match the
    fixed-count mode (both sample from the same hypothesis distribution;
    VERDICT r4 item 1)."""
    from ransacflow_tpu.ops import ransac_homography_adaptive

    m1, m2, H, n_out = _make_ransac_problem(rng, n=240, inlier_frac=0.55)
    valid = jnp.ones(len(m1), bool)
    tgt = m2[n_out:, :2]

    def h_gap(ha, hb):
        # how differently two fitted Hs map the TRUE inlier set
        ea = np.asarray(apply_homography(ha, jnp.asarray(tgt)))
        eb = np.asarray(apply_homography(hb, jnp.asarray(tgt)))
        return np.linalg.norm(ea - eb, axis=1).max()

    fixed_counts, adaptive_counts = [], []
    gaps_fixed_fixed, gaps_fixed_adaptive = [], []
    for seed in range(8):
        fx = ransac_homography(
            jax.random.PRNGKey(seed), jnp.asarray(m1), jnp.asarray(m2),
            valid, tolerance=0.05, n_iter=4096)
        fx2 = ransac_homography(
            jax.random.PRNGKey(200 + seed), jnp.asarray(m1),
            jnp.asarray(m2), valid, tolerance=0.05, n_iter=4096)
        ad, _ = ransac_homography_adaptive(
            jax.random.PRNGKey(100 + seed), jnp.asarray(m1),
            jnp.asarray(m2), valid, tolerance=0.05, n_iter=4096, chunk=512)
        fixed_counts.append(int(fx.num_inliers))
        adaptive_counts.append(int(ad.num_inliers))
        gaps_fixed_fixed.append(h_gap(fx.H21, fx2.H21))
        gaps_fixed_adaptive.append(h_gap(fx.H21, ad.H21))
    # same planted structure recovered: means within 3 correspondences
    assert abs(np.mean(fixed_counts) - np.mean(adaptive_counts)) <= 3.0
    # adaptive-vs-fixed geometry scatter is the same run-to-run scatter two
    # independent FIXED runs show (no systematic bias from early exit), and
    # stays well inside the inlier tolerance
    assert np.median(gaps_fixed_adaptive) <= max(
        2.0 * np.median(gaps_fixed_fixed), 0.01)
    assert np.max(gaps_fixed_adaptive) <= max(
        2.0 * np.max(gaps_fixed_fixed), 0.01)


def test_fused_multihomo_adaptive_matches_fixed_geometry(rng):
    """adaptive_chunk in the fused loop changes hypothesis budgeting only:
    accepted count and first-homography geometry agree with fixed mode on
    a well-matched synthetic pair (different PRNG draws => compare the
    fitted transform's action, not bits)."""
    from ransacflow_tpu.ops import ransac_homography_adaptive  # noqa: F401

    m1, m2, H, n_out = _make_ransac_problem(rng, n=300, inlier_frac=0.8)
    valid = jnp.ones(len(m1), bool)
    fx = ransac_homography(
        jax.random.PRNGKey(5), jnp.asarray(m1), jnp.asarray(m2), valid,
        tolerance=0.05, n_iter=8192)
    ad, n_eval = ransac_homography_adaptive(
        jax.random.PRNGKey(6), jnp.asarray(m1), jnp.asarray(m2), valid,
        tolerance=0.05, n_iter=8192, chunk=2048)
    assert int(n_eval) == 2048
    tgt = m2[n_out:, :2]
    e_f = np.asarray(apply_homography(fx.H21, jnp.asarray(tgt)))
    e_a = np.asarray(apply_homography(ad.H21, jnp.asarray(tgt)))
    assert np.linalg.norm(e_f - e_a, axis=1).max() < 0.02
