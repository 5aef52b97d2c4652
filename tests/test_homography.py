"""DLT / warp-grid / affine-fit parity vs the reference's numpy formulas."""

import numpy as np
import jax.numpy as jnp

from ransacflow_tpu.ops import (
    dlt_homography,
    warp_grid,
    apply_homography,
    fit_affine,
    reprojection_error,
)


def _numpy_dlt(X, Y):
    """Golden: the reference's DLT construction (utils/outil.py:68-87),
    re-derived from the standard 4-point DLT formula."""
    N = X.shape[0]
    A = np.zeros((N, 8, 9))
    for i in range(4):
        u, v = Y[:, i, 0], Y[:, i, 1]
        u_, v_ = X[:, i, 0], X[:, i, 1]
        A[:, 2 * i] = np.stack(
            [np.zeros(N), np.zeros(N), np.zeros(N), -u, -v, -np.ones(N),
             v_ * u, v_ * v, v_], axis=1)
        A[:, 2 * i + 1] = np.stack(
            [u, v, np.ones(N), np.zeros(N), np.zeros(N), np.zeros(N),
             -u_ * u, -u_ * v, -u_], axis=1)
    _, _, vh = np.linalg.svd(A)
    return vh[:, 8].reshape(N, 3, 3)


def _random_h(rng):
    H = np.eye(3) + rng.randn(3, 3) * 0.1
    return H / np.linalg.norm(H)


def _spread_quad(rng, n):
    """Well-conditioned minimal sets: jittered unit-square corners."""
    base = np.array([[-0.8, -0.8], [0.8, -0.8], [0.8, 0.8], [-0.8, 0.8]])
    return base[None] + rng.rand(n, 4, 2) * 0.3 - 0.15


def test_dlt_recovers_exact_homography(rng):
    """4 exact correspondences -> DLT must reproduce the generating H."""
    Y = _spread_quad(rng, 8)
    for n in range(8):
        H = _random_h(rng)
        X = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(Y[n][None])))
        Hest = np.asarray(
            dlt_homography(jnp.asarray(X.astype(np.float32)),
                           jnp.asarray(Y[n][None].astype(np.float32)))
        )[0]
        Hest = Hest / Hest[2, 2] * H[2, 2]
        # fp32 4-point DLT carries ~few-1e-3 conditioning slop even on exact
        # data (fp64 gets ~0); the pipeline's host fp64 polish of the single
        # winning hypothesis removes it where it matters.
        np.testing.assert_allclose(Hest, H, atol=6e-3)


def test_dlt_matches_numpy_svd_nullvector(rng):
    """fp32 normalized DLT tracks the reference's fp64 SVD null vector."""
    Y = _spread_quad(rng, 16)
    X = np.zeros_like(Y)
    for n in range(16):
        H = _random_h(rng)
        X[n] = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(Y[n][None])))[0]
    X += rng.randn(*X.shape) * 0.01  # noise so the system is full rank 8
    gold = _numpy_dlt(X, Y)
    ours = np.asarray(
        dlt_homography(jnp.asarray(X.astype(np.float32)),
                       jnp.asarray(Y.astype(np.float32)))
    )
    for n in range(16):
        a = ours[n].ravel()
        b = gold[n].ravel()
        b = b / np.linalg.norm(b)
        sign = np.sign(np.dot(a, b))
        np.testing.assert_allclose(a * sign, b, atol=5e-3)


def test_warp_grid_identity_is_normalized_grid():
    H = jnp.eye(3)[None]
    g = np.asarray(warp_grid(H, 6, 8))
    from ransacflow_tpu.ops import normalized_grid

    np.testing.assert_allclose(g[0], np.asarray(normalized_grid(6, 8)), atol=1e-6)


def test_warp_grid_matches_pointwise_homography(rng):
    H = jnp.asarray(_random_h(rng).astype(np.float32))[None]
    g = np.asarray(warp_grid(H, 5, 5))
    from ransacflow_tpu.ops import normalized_grid

    base = np.asarray(normalized_grid(5, 5)).reshape(-1, 2)
    expect = np.asarray(
        apply_homography(H[0], jnp.asarray(base))
    ).reshape(5, 5, 2)
    np.testing.assert_allclose(g[0], expect, atol=1e-5)


def test_fit_affine_matches_lstsq(rng):
    """Reference Affine = lstsq of Y -> X[:, :2] (utils/outil.py:48-55)."""
    Y = np.concatenate([rng.rand(10, 2) * 2 - 1, np.ones((10, 1))], axis=1)
    M = rng.randn(3, 2) * 0.5
    X2 = Y @ M + rng.randn(10, 2) * 0.01
    X = np.concatenate([X2, np.ones((10, 1))], axis=1).astype(np.float32)
    ours = np.asarray(fit_affine(jnp.asarray(X), jnp.asarray(Y.astype(np.float32))))
    gold_M = np.linalg.lstsq(Y, X2, rcond=None)[0].T
    gold = np.vstack([gold_M, [0, 0, 1]])
    np.testing.assert_allclose(ours, gold, atol=1e-4)


def test_reprojection_error_formula(rng):
    H = _random_h(rng).astype(np.float32)
    m2 = np.concatenate([rng.rand(7, 2) * 2 - 1, np.ones((7, 1))], 1).astype(np.float32)
    m1 = np.concatenate([rng.rand(7, 2) * 2 - 1, np.ones((7, 1))], 1).astype(np.float32)
    est = m2 @ H.T
    est = est / est[:, 2:]
    gold = np.sqrt(((m1[:, :2] - est[:, :2]) ** 2).sum(1))
    ours = np.asarray(
        reprojection_error(jnp.asarray(m1), jnp.asarray(m2), jnp.asarray(H[None]))
    )[0]
    np.testing.assert_allclose(ours, gold, atol=1e-5)
