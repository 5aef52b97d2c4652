"""Direct tests for the small auxiliary surfaces that are otherwise only
reached through CLIs or higher-level fixtures: the reference-API no-grad
flow head, the sky bg-mask hooks (incl. the YFCC rotation semantics), and
the profiler trace context manager."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ransacflow_tpu.models import init_net_flow_coarse
from ransacflow_tpu.models.heads import (
    pred_flow_coarse,
    pred_flow_coarse_no_grad,
)
from ransacflow_tpu.ops.grid import normalized_grid
from ransacflow_tpu.eval.sky import (
    resize_mask,
    make_sky_bg_fn,
    make_sky_bg_fn_rotated,
)
from ransacflow_tpu.utils.monitor import profile_trace


def test_pred_flow_coarse_no_grad_matches_grad_variant():
    """predFlowCoarseNoGrad (model/model.py:342-350) returns the same
    absolute sampling grid as predFlowCoarse, just without the gradient
    term."""
    params = init_net_flow_coarse(jax.random.PRNGKey(0), 7)
    corr = jax.random.uniform(jax.random.PRNGKey(1), (1, 6, 8, 49))
    grid = normalized_grid(48, 64)[None]
    _, final, _ = pred_flow_coarse(params, corr, grid)
    final_ng = pred_flow_coarse_no_grad(params, corr, grid)
    np.testing.assert_allclose(np.asarray(final_ng), np.asarray(final),
                               atol=1e-6)
    assert final_ng.shape == (1, 48, 64, 2)
    assert float(jnp.abs(final_ng).max()) <= 1.0  # clamp(flow + grid)


class _FakeSegmenter:
    def __init__(self, sky):
        self._sky = sky
        self.calls = []

    def get_sky(self, path):
        self.calls.append(path)
        return self._sky


def test_sky_bg_fn_mask_semantics():
    """resize_mask mirrors the reference's imresize(mask)*255 < 128
    threshold: 1 = usable foreground, sky pixels excluded."""
    sky = np.zeros((16, 16), np.float32)
    sky[:8] = 1.0  # top half is sky
    seg = _FakeSegmenter(sky)
    fn = make_sky_bg_fn(seg)
    bg = fn("img.png", (32, 32))
    assert seg.calls == ["img.png"]
    assert bg.shape == (32, 32) and bg.dtype == np.float32
    assert bg[:12].max() == 0.0 and bg[20:].min() == 1.0


def test_sky_bg_fn_rotated_rotates_with_target():
    """YFCC: the sky mask is computed on the unrotated image and rotated
    with the target (evaluation/evalYFCC/evaluation.py:190-212) — rotating
    the mask then resizing equals resize of the pre-rotated mask for
    square shapes."""
    rng = np.random.RandomState(0)
    sky = (rng.rand(16, 16) > 0.5).astype(np.float32)
    fn = make_sky_bg_fn_rotated(_FakeSegmenter(sky))
    for angle in (0, 90, 180, 270):
        got = fn("x", (32, 32), angle)
        want = resize_mask(np.rot90(sky, angle // 90), (32, 32))
        np.testing.assert_array_equal(got, want)
    # identity check: angle 0 == the unrotated hook
    np.testing.assert_array_equal(
        fn("x", (32, 32), 0), make_sky_bg_fn(_FakeSegmenter(sky))("x", (32, 32))
    )


def test_profile_trace_writes_trace(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "profiler trace produced no files"

    # disabled mode is a no-op (no directory created)
    with profile_trace(str(tmp_path / "off"), enabled=False):
        pass
    assert not os.path.exists(str(tmp_path / "off"))
