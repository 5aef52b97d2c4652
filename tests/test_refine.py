"""Tests for the iterative-refinement port (pipeline/refine.py vs the
reference's evaluation/evalHpatch/utils.py:27-66 `iterative`).

The flow-fit RANSAC sees the dense (grid -> flow_est) correspondences;
planting an exact homography flow with a corrupted-but-matched block
checks outlier rejection, and the zero-flow-params trick (see
tests/test_validation.py) makes the re-run fine stage exactly reproduce
the refined coarse grid.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ransacflow_tpu.ops.homography import warp_grid, apply_homography
from ransacflow_tpu.pipeline import init_alignment_params, refine_flow_ransac
from ransacflow_tpu.pipeline.fine import fine_features

HT, WT = 48, 64
H_GT = np.array(
    [[0.9, 0.05, 0.02], [-0.03, 0.85, -0.05], [0.01, -0.02, 1.0]],
    np.float32,
)


def _zero_flow_params(key=0):
    params = init_alignment_params(jax.random.PRNGKey(key))
    conv4 = params["netFlowCoarse"]["conv4"]["weight"]
    params["netFlowCoarse"]["conv4"]["weight"] = jnp.zeros_like(conv4)
    return params


def _norm(h):
    h = np.asarray(h, np.float64)
    return h / h[2, 2]


@pytest.fixture(scope="module")
def setup():
    params = _zero_flow_params()
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.rand(1, HT, WT, 3).astype(np.float32))
    tgt = jnp.asarray(rng.rand(1, HT, WT, 3).astype(np.float32))
    featt = fine_features(params, tgt)
    return params, src, featt


def test_refine_recovers_homography_with_outliers(setup):
    params, src, featt = setup
    flow = np.array(warp_grid(jnp.asarray(H_GT)[None], HT, WT))
    # corrupt a block of the flow but leave it "matched": RANSAC must
    # reject it (reference tolerance 0.03, utils.py:27)
    flow[0, 10:26, 20:44] += 0.4
    match = np.ones((HT, WT), np.float32)

    out = refine_flow_ransac(
        jax.random.PRNGKey(0), params, src, featt,
        jnp.asarray(flow), jnp.asarray(match), n_iter=300,
    )
    assert bool(out["found"])
    np.testing.assert_allclose(
        _norm(out["refined_h"]), _norm(H_GT), atol=1e-3
    )
    # outlier block is not in the consensus; clean pixels are
    assert int(out["num_inliers"]) > 0.9 * (HT * WT - 16 * 24)
    # zero-flow params: the re-run fine stage reproduces the refined
    # coarse grid exactly (sampled at exact pixel centers)
    refined_grid = np.asarray(
        warp_grid(jnp.asarray(out["refined_h"])[None], HT, WT)
    )
    np.testing.assert_allclose(
        np.asarray(out["flow"]), refined_grid, atol=5e-3
    )


def test_refine_identity_fallback_when_unmatched(setup):
    """All matchability below threshold -> reference's np.eye fallback
    (utils.py:40-41)."""
    params, src, featt = setup
    flow = warp_grid(jnp.asarray(H_GT)[None], HT, WT)
    match = jnp.zeros((HT, WT), jnp.float32)
    out = refine_flow_ransac(
        jax.random.PRNGKey(0), params, src, featt, flow, match, n_iter=64,
    )
    assert not bool(out["found"])
    np.testing.assert_array_equal(
        np.asarray(out["refined_h"]), np.eye(3, dtype=np.float32)
    )


def test_refine_affine_mode(setup):
    params, src, featt = setup
    theta = np.array([[0.8, 0.1, 0.05], [-0.05, 0.9, -0.1]], np.float32)
    h_aff = np.vstack([theta, [0.0, 0.0, 1.0]]).astype(np.float32)
    flow = warp_grid(jnp.asarray(h_aff)[None], HT, WT)
    match = jnp.ones((HT, WT), jnp.float32)
    out = refine_flow_ransac(
        jax.random.PRNGKey(1), params, src, featt, flow, match,
        transform="affine", n_iter=64, n_points=3,
    )
    assert bool(out["found"])
    # on exact data every valid hypothesis ties at full inlier count and
    # argmax may pick an ill-conditioned minimal set, so assert the fit's
    # reprojection rather than tight matrix equality
    np.testing.assert_allclose(
        np.asarray(out["refined_h"]), h_aff, atol=0.02
    )
    refit_grid = np.asarray(
        warp_grid(jnp.asarray(out["refined_h"])[None], HT, WT)
    )
    assert np.abs(refit_grid - np.asarray(flow)).max() < 0.03  # < tolerance


def test_refine_out_of_bounds_flow_excluded(setup):
    """Pixels whose estimated flow leaves [-1,1] are dropped from the fit
    (utils.py:30) — plant garbage OOB flow on half the image and check the
    fit still recovers H_GT."""
    params, src, featt = setup
    flow = np.array(warp_grid(jnp.asarray(H_GT)[None], HT, WT))
    flow[0, :, : WT // 2] = 5.0  # far out of bounds
    match = np.ones((HT, WT), np.float32)
    out = refine_flow_ransac(
        jax.random.PRNGKey(2), params, src, featt,
        jnp.asarray(flow), jnp.asarray(match), n_iter=300,
    )
    assert bool(out["found"])
    np.testing.assert_allclose(
        _norm(out["refined_h"]), _norm(H_GT), atol=1e-3
    )
