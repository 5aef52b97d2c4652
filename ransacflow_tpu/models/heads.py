"""Flow and matchability heads over the local correlation volume.

Mirrors NetFlowCoarse / NetMatchability (model/model.py:167-322): a shared
trunk shape conv3x3 k^2 -> 512 -> 256 -> 128 (BN+ReLU between) and a final
conv3x3 to k^2 (flow, softmax-expectation over offsets) or 1 (matchability,
sigmoid). All convs bias-free. Optional x8 bilinear upsampling
(align_corners=True).
"""

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.layers import (
    conv2d,
    batch_norm,
    kaiming_normal_conv,
    bn_init,
)
from ransacflow_tpu.ops.correlation import corr_offset_grids
from ransacflow_tpu.ops.sampler import upsample_bilinear_x8

_TRUNK = [512, 256, 128]


def _init_head(key, kernel_size, out_ch, final_std=None, dtype=jnp.float32):
    k2 = kernel_size * kernel_size
    keys = jax.random.split(key, 4)
    widths = [k2] + _TRUNK
    p = {}
    for i in range(3):
        p[f"conv{i+1}"] = {
            "weight": kaiming_normal_conv(
                keys[i], 3, 3, widths[i], widths[i + 1], dtype
            )
        }
        p[f"bn{i+1}"] = bn_init(widths[i + 1], dtype)
    if final_std is None:
        w4 = kaiming_normal_conv(keys[3], 3, 3, 128, out_ch, dtype)
    else:
        w4 = jax.random.normal(keys[3], (3, 3, 128, out_ch), dtype) * final_std
    p["conv4"] = {"weight": w4}
    return p


def init_net_flow_coarse(key, kernel_size=7, dtype=jnp.float32):
    k2 = kernel_size * kernel_size
    return _init_head(key, kernel_size, k2, dtype=dtype)


def init_net_matchability(key, kernel_size=7, dtype=jnp.float32):
    # conv4 ~ N(0, 1e-4) so the initial matchability is ~0.5
    # (reference: model/model.py:284-285)
    return _init_head(key, kernel_size, 1, final_std=1e-4, dtype=dtype)


def _trunk(params, corr, train, axis_name):
    stats = {}
    x = corr
    for i in (1, 2, 3):
        x = conv2d(x, params[f"conv{i}"]["weight"], padding=1)
        x, s = batch_norm(x, params[f"bn{i}"], train, axis_name)
        if s:
            stats[f"bn{i}"] = s
        x = jax.nn.relu(x)
    x = conv2d(x, params["conv4"]["weight"], padding=1)
    return x, stats


def net_flow_coarse(params, corr, up8=True, kernel_size=7, train=False,
                    axis_name=None):
    """Predict normalized residual flow from a correlation volume.

    Args:
      corr: (B, H, W, k^2) correlation volume.
    Returns (flow, stats): flow is (B, H, W, 2) — or (B, 8H, 8W, 2) with
    up8 — in normalized [-1, 1] *increments*: channel 0 = x (col) offset,
    channel 1 = y (row) offset, computed as the softmax expectation over the
    k x k offset grid divided by the feature width/height
    (reference: model/model.py:228-234).
    """
    logits, stats = _trunk(params, corr, train, axis_name)
    p = jax.nn.softmax(logits, axis=-1)
    gx, gy = corr_offset_grids(kernel_size, p.dtype)
    _, H, W, _ = p.shape
    flow_x = jnp.sum(p * gx, axis=-1) / W * 2.0
    flow_y = jnp.sum(p * gy, axis=-1) / H * 2.0
    flow = jnp.stack([flow_x, flow_y], axis=-1)
    if up8:
        flow = upsample_bilinear_x8(flow)
    return flow, stats


def net_matchability(params, corr, up8=True, train=False, axis_name=None):
    """Predict per-pixel matchability in (0, 1). Returns ((B,H,W,1), stats)."""
    logits, stats = _trunk(params, corr, train, axis_name)
    m = jax.nn.sigmoid(logits)
    if up8:
        m = upsample_bilinear_x8(m)
    return m, stats


def pred_flow_coarse(params, corr, grid, up8=True, kernel_size=7,
                     train=False, axis_name=None):
    """Reference-API convenience: (flow_gradient, absolute sampling grid)
    (model/model.py:331-340)."""
    flow, stats = net_flow_coarse(params, corr, up8, kernel_size, train,
                                  axis_name)
    return flow_gradient_magnitude(flow), flow_to_grid(flow, grid), stats


def pred_flow_coarse_no_grad(params, corr, grid, up8=True, kernel_size=7):
    """Reference-API convenience: absolute sampling grid only
    (model/model.py:342-350)."""
    flow, _ = net_flow_coarse(params, corr, up8, kernel_size)
    return flow_to_grid(flow, grid)


def pred_matchability(params, corr, up8=True, train=False, axis_name=None):
    """Reference-API alias for `net_matchability` (model/model.py:353-357)."""
    return net_matchability(params, corr, up8, train, axis_name)


def flow_gradient_magnitude(flow):
    """Diagonal forward-difference magnitude of a (B, H, W, 2) flow field.

    ``|flow[1:, 1:] - flow[:-1, :-1]|_2`` over the 2 channels — the
    flow-smoothness term of predFlowCoarse (model/model.py:335-336).
    Returns (B, H-1, W-1, 1).
    """
    d = flow[:, 1:, 1:, :] - flow[:, :-1, :-1, :]
    # safe norm: the plain norm's gradient is NaN at exactly-zero d, which
    # bf16-quantized flow hits routinely (equal adjacent upsampled values).
    # The 1e-24 floor changes the forward value by <= 1e-12 and zeroes the
    # gradient only where d == 0.
    sq = jnp.sum(d * d, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def flow_to_grid(flow, grid):
    """Absolute sampling grid: clamp(flow + grid, -1, 1)
    (reference: model/model.py:338)."""
    return jnp.clip(flow + grid, -1.0, 1.0)
