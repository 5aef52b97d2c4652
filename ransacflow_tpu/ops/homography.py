"""Homography / affine fitting and warp grids — all batched, all on-device.

The reference solves its 4-point DLT systems with a *host* numpy SVD in
chunks of 100 hypotheses (utils/outil.py:68-87,136-160), paying a
GPU->CPU->GPU round trip per chunk. Here the null vector of each 8x9 DLT
system is found on-device as the smallest eigenvector of the 9x9 normal
matrix A^T A — a tiny symmetric eigenproblem that vmaps over all 50k
hypotheses in one XLA call (no host round trips, no chunking).
"""

import jax
import jax.numpy as jnp


def apply_homography(H, pts, eps=0.0):
    """Apply 3x3 homographies to (x, y) points and dehomogenize.

    Args:
      H: (..., 3, 3)
      pts: (..., N, 2) or (..., N, 3) homogeneous.
    Returns (..., N, 2).
    """
    if pts.shape[-1] == 2:
        pts = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", H, pts)
    z = out[..., 2:3]
    if eps:
        z = z + eps
    return out[..., :2] / z


def warp_grid(H, h, w):
    """kornia ``HomographyWarper(h, w).warp_grid(H)`` equivalent.

    Builds the corner-anchored normalized (x, y) grid over the destination
    image and maps it through ``H`` (dst -> src), giving the grid of source
    coords to sample with `grid_sample`. Plain dehomogenizing division, as in
    kornia 0.1.4 (used by the reference, e.g.
    evaluation/evalHpatch/evaluation.py:218).

    Args:
      H: (B, 3, 3)
    Returns (B, h, w, 2).
    """
    x = jnp.linspace(-1.0, 1.0, w, dtype=H.dtype)
    y = jnp.linspace(-1.0, 1.0, h, dtype=H.dtype)
    gx, gy = jnp.meshgrid(x, y)
    pts = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)
    out = apply_homography(H, pts[None].repeat(H.shape[0], axis=0))
    return out.reshape(H.shape[0], h, w, 2)


def _dlt_system(X, Y):
    """Build the (..., 8, 9) DLT system for H21 with Y @ H21^T ~ X.

    Same row layout as the reference (utils/outil.py:74-81):
    for each correspondence i, with (u, v) = Y_i and (u', v') = X_i,
      row 2i   = [ 0  0  0 -u -v -1  v'u  v'v  v']
      row 2i+1 = [ u  v  1  0  0  0 -u'u -u'v -u']

    Args:
      X: (..., 4, 2|3) source points, Y: (..., 4, 2|3) target points.
    """
    u, v = Y[..., 0], Y[..., 1]        # (..., 4)
    up, vp = X[..., 0], X[..., 1]
    zeros = jnp.zeros_like(u)
    ones = jnp.ones_like(u)
    r_even = jnp.stack(
        [zeros, zeros, zeros, -u, -v, -ones, vp * u, vp * v, vp], axis=-1
    )  # (..., 4, 9)
    r_odd = jnp.stack(
        [u, v, ones, zeros, zeros, zeros, -up * u, -up * v, -up], axis=-1
    )
    A = jnp.stack([r_even, r_odd], axis=-2)  # (..., 4, 2, 9)
    return A.reshape(*A.shape[:-3], 8, 9)


def _hartley_normalize(P):
    """Per-set similarity normalization: centroid 0, mean distance sqrt(2).

    Args:
      P: (..., n, 2) point sets.
    Returns (T, Pn) with Pn = points mapped by the (..., 3, 3) transform T.
    """
    c = jnp.mean(P, axis=-2, keepdims=True)  # (..., 1, 2)
    d = jnp.mean(jnp.sqrt(jnp.sum((P - c) ** 2, axis=-1)), axis=-1)  # (...,)
    s = jnp.sqrt(2.0).astype(P.dtype) / jnp.maximum(d, 1e-12)
    Pn = (P - c) * s[..., None, None]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    cx, cy = c[..., 0, 0], c[..., 0, 1]
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * cx], axis=-1),
            jnp.stack([zeros, s, -s * cy], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return T, Pn


def _adjugate_3x3(M):
    """Closed-form 3x3 adjugate (transpose of cofactor matrix).

    ``M @ adj(M) = det(M) * I`` — gives matmul-only 3x3 inversion up to
    scale, which is all projective math needs. Pure elementwise arithmetic:
    VPU-friendly, batches over any leading dims.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    adj = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj


def _basis_transform(P):
    """3x3 map sending the projective basis e1,e2,e3,(1,1,1) to 4 points.

    Classical construction: with M = [p1 p2 p3] (columns), find coefficients
    c = adj(M) @ p4 (so M @ c ~ p4) and scale the columns: T = M * c.
    """
    p = jnp.concatenate([P, jnp.ones_like(P[..., :1])], axis=-1)  # (...,4,3)
    M = jnp.stack([p[..., 0, :], p[..., 1, :], p[..., 2, :]], axis=-1)
    c = jnp.einsum("...ij,...j->...i", _adjugate_3x3(M), p[..., 3, :])
    return M * c[..., None, :]


def dlt_homography(X, Y, method="projective"):
    """Batched 4-point DLT: homographies H21 with X ~ Y @ H21^T.

    Both point sets are Hartley-normalized per minimal set before solving;
    with that conditioning fix, an fp32 solve matches the reference's fp64
    numpy SVD to ~1e-3 in the H entries (verified in tests), so everything
    stays on-device in fp32.

    Args:
      X: (..., 4, 2|3) source minimal sets.
      Y: (..., 4, 2|3) target minimal sets.
      method:
        'projective' (default): closed-form projective-basis construction —
          H = T_X @ adj(T_Y) where T_* map the projective basis to the four
          points. Exact for minimal sets (4 points determine H), built only
          from elementwise arithmetic and 3x3 matmuls, so it runs at VPU
          speed over 50k hypotheses. Batched iterative decompositions
          (QDWH eigh/svd) are ~1000x slower on TPU for these tiny systems.
        'svd': null vector of the normalized 8x9 DLT system (the
          reference's formulation, utils/outil.py:68-87).
        'eigh': smallest eigenvector of the 9x9 normal equations.
    Returns (..., 3, 3), scaled to unit Frobenius norm (the reference
    returns the unit-norm null vector of the unnormalized system — same
    model up to scale/sign, which RANSAC scoring is invariant to).
    """
    T1, Xn = _hartley_normalize(X[..., :2])
    T2, Yn = _hartley_normalize(Y[..., :2])
    if method == "projective":
        BX = _basis_transform(Xn)  # basis -> normalized source pts
        BY = _basis_transform(Yn)  # basis -> normalized target pts
        Hn = BX @ _adjugate_3x3(BY)
    else:
        A = _dlt_system(Xn, Yn)
        if method == "svd":
            _, _, vh = jnp.linalg.svd(A)
            hvec = vh[..., 8, :]
        else:
            AtA = jnp.einsum("...ki,...kj->...ij", A, A)
            _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
            hvec = vecs[..., :, 0]
        Hn = hvec.reshape(*hvec.shape[:-1], 3, 3)
    # denormalize: T1 X ~ Hn (T2 Y)  =>  X ~ (T1^-1 Hn T2) Y.
    # T1 is a similarity [s, s, 1; -s cx, -s cy] — invert in closed form.
    T1_inv = _adjugate_3x3(T1) / jnp.maximum(
        jnp.linalg.det(T1), 1e-20
    )[..., None, None]
    H = T1_inv @ Hn @ T2
    norm = jnp.linalg.norm(H.reshape(*H.shape[:-2], 9), axis=-1)
    return H / jnp.maximum(norm, 1e-12)[..., None, None]


def dlt_homography_np(X, Y):
    """Host fp64 single-set DLT (numpy), used to polish the RANSAC winner.

    Reproduces the reference's numpy-SVD numerics (utils/outil.py:68-87)
    exactly for the one hypothesis that matters, while the 50k-hypothesis
    search stays on-device in fp32. Exactly = bitwise: the reference builds
    the system from float32 coordinate arrays, so the cross products
    (v'u etc.) round in float32 before entering the fp64 system — inputs
    are kept at their native dtype here for the same rounding
    (tests/test_reference_golden.py asserts atol=1e-7 against the
    reference's executing Homography).

    Args:
      X: (4, 2|3) source points, Y: (4, 2|3) target points (numpy).
    Returns (3, 3) float64 H21 (unit-norm null vector).
    """
    import numpy as np

    X = np.asarray(X)
    Y = np.asarray(Y)
    A = np.zeros((8, 9))
    for i in range(4):
        u, v = Y[i, 0], Y[i, 1]
        up, vp = X[i, 0], X[i, 1]
        A[2 * i] = [0, 0, 0, -u, -v, -1, vp * u, vp * v, vp]
        A[2 * i + 1] = [u, v, 1, 0, 0, 0, -up * u, -up * v, -up]
    _, _, vh = np.linalg.svd(A)
    return vh[8].reshape(3, 3)


def fit_affine(X, Y):
    """Least-squares affine fit X ~ Y @ M (reference: utils/outil.py:48-55).

    Args:
      X: (..., N, 3) source homogeneous points.
      Y: (..., N, 3) target homogeneous points.
    Returns (..., 3, 3) with last row [0, 0, 1]. Solved via the 3x3 normal
    equations so it batches over leading dims on-device.
    """
    YtY = jnp.einsum("...ni,...nj->...ij", Y, Y)
    YtX = jnp.einsum("...ni,...nj->...ij", Y, X[..., :2])
    M = jnp.linalg.solve(YtY, YtX)  # (..., 3, 2)
    top = jnp.swapaxes(M, -1, -2)  # (..., 2, 3)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 1.0]], dtype=X.dtype), (*top.shape[:-2], 1, 3)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def fit_hough(X, Y):
    """Axis-aligned scale + translation fit (reference: utils/outil.py:57-66;
    defined for completeness — unused by the main path there too).

    Solves, per axis, least-squares [y, 1] @ [a, b] = x. Batched via 2x2
    normal equations.

    Args:
      X: (..., N, 2|3) source, Y: (..., N, 2|3) target.
    Returns (..., 3, 3) diag-scale + translation matrices.
    """
    def axis_fit(y, x):
        ones = jnp.ones_like(y)
        a11 = jnp.sum(y * y, -1)
        a12 = jnp.sum(y, -1)
        a22 = jnp.sum(ones, -1)
        b1 = jnp.sum(y * x, -1)
        b2 = jnp.sum(x, -1)
        det = a11 * a22 - a12 * a12
        s = (a22 * b1 - a12 * b2) / det
        t = (a11 * b2 - a12 * b1) / det
        return s, t

    sx, tx = axis_fit(Y[..., 0], X[..., 0])
    sy, ty = axis_fit(Y[..., 1], X[..., 1])
    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([sx, zeros, tx], -1),
            jnp.stack([zeros, sy, ty], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )


def fit_translation(X, Y):
    """Single-correspondence translation (reference: utils/outil.py:89-95).

    Uses the FIRST point of each set, as the reference does.
    """
    tx = X[..., 0, 0] - Y[..., 0, 0]
    ty = X[..., 0, 1] - Y[..., 0, 1]
    zeros = jnp.zeros_like(tx)
    ones = jnp.ones_like(tx)
    return jnp.stack(
        [
            jnp.stack([ones, zeros, tx], -1),
            jnp.stack([zeros, ones, ty], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )


def reprojection_error(match1, match2, H21):
    """L2 reprojection error of each correspondence under each H21.

    Mirrors the reference's ``Prediction`` (utils/outil.py:97-100):
    ``estimX = match2 @ H21^T`` dehomogenized, distance to match1.

    Args:
      match1: (N, 3) source, match2: (N, 3) target (homogeneous).
      H21: (..., 3, 3) hypotheses.
    Returns (..., N) distances.
    """
    est = apply_homography(H21, match2[..., :2])
    d = match1[..., :2] - est
    return jnp.sqrt(jnp.sum(d * d, axis=-1))
