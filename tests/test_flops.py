"""FLOP-model checks: the analytic counters behind bench.py's MFU line.

The conv-stack counters are cross-checked against XLA's own cost analysis
of the real jitted programs at a small shape (loose tolerance: XLA's conv
flop accounting differs slightly on padded taps and folds elementwise ops
in), and the matmul-shaped counters against their closed-form definitions.
"""

import jax
import jax.numpy as jnp
import pytest

from ransacflow_tpu.utils.flops import (
    conv_flops,
    correlation_flops,
    feature_extractor_flops,
    fused_align_flops,
    head_flops,
    matching_flops,
    peak_flops_per_chip,
    ransac_flops,
    resnet50_layer3_flops,
)


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    ca = c if isinstance(c, dict) else c[0]
    return float(ca["flops"])


def test_resnet_flops_match_xla_cost_analysis():
    from ransacflow_tpu.models.resnet50 import (
        init_resnet50_layer3, resnet50_layer3,
    )

    p = init_resnet50_layer3(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    xla = _xla_flops(lambda p, x: resnet50_layer3(p, x)[0], p, x)
    analytic = resnet50_layer3_flops(64, 64)
    assert abs(analytic - xla) / xla < 0.15, (analytic, xla)


def test_feature_extractor_flops_match_xla_cost_analysis():
    from ransacflow_tpu.models.feature_extractor import (
        feature_extractor, init_feature_extractor,
    )

    p = init_feature_extractor(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    xla = _xla_flops(lambda p, x: feature_extractor(p, x)[0], p, x)
    analytic = feature_extractor_flops(64, 64)
    assert abs(analytic - xla) / xla < 0.15, (analytic, xla)


def test_matmul_shaped_counters_closed_form():
    assert conv_flops(10, 12, 3, 7, 3, 3) == 2 * 10 * 12 * 3 * 7 * 9
    assert matching_flops(100, 50) == 2 * 100 * 50 * 1024
    assert correlation_flops(8, 10) == 2 * 8 * 10 * 256 * 49
    # head: 4 convs, 3x3, k^2 -> 512 -> 256 -> 128 -> out
    h = head_flops(8, 10, kernel_size=7, out_ch=1)
    expect = sum(
        conv_flops(8, 10, cin, cout)
        for cin, cout in ((49, 512), (512, 256), (256, 128), (128, 1))
    )
    assert h == expect
    assert ransac_flops(1000, 500) == 26 * 1000 * 500 + 1500 * 500


def test_fused_align_flops_stage_sum_and_shape():
    stages = fused_align_flops([(96, 128), (64, 96)], (64, 96), n_iter=256)
    assert set(stages) == {
        "trunk", "matching", "ransac", "fine_features", "correlation",
        "heads", "total",
    }
    assert stages["total"] == sum(
        v for k, v in stages.items() if k != "total"
    )
    assert all(v > 0 for v in stages.values())


@pytest.mark.parametrize(
    "kind,peak_tflops",
    [
        ("TPU v5 lite", 197), ("TPU v5e", 197), ("TPU v5p", 459),
        ("TPU v4", 275), ("TPU v3", 123), ("TPU v6 lite", 918),
        ("unknown accelerator", None),
    ],
)
def test_peak_flops_mapping(kind, peak_tflops):
    # unrecognized kinds return None so callers omit MFU rather than
    # compute it against a fabricated peak
    expected = None if peak_tflops is None else peak_tflops * 1e12
    assert peak_flops_per_chip(kind) == expected
