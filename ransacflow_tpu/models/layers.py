"""Functional NN primitives with torch-mirroring parameter trees.

Models in this framework are plain functions over nested-dict parameter
pytrees whose keys mirror the reference's `state_dict()` names (so the
torch->JAX weight converter is a mechanical transpose, see convert.py) and
whose conv kernels are stored HWIO / activations NHWC — the native TPU
layouts.

BatchNorm state (running_mean / running_var) lives in the same tree as the
learnable scale/bias; `batch_norm` returns updated stats in train mode, and
syncs batch moments across a named mesh axis with `lax.pmean` when
`axis_name` is given — the TPU-native equivalent of the reference's
vendored synchronized-BatchNorm (segNet/lib/nn/modules/batchnorm.py).
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: new = (1 - m) * old + m * batch


def conv2d(x, weight, bias=None, stride=1, padding=1, groups=1, dilation=1):
    """2-D conv, NHWC activations, HWIO weights, symmetric zero padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    # the weight dtype defines the compute dtype (mixed-precision
    # convention): bf16 weights pull fp32 activations down to bf16.
    # int8 weights select the MXU's int8 path (2x bf16 throughput on
    # v5e) with int32 accumulation; callers own the quantization scales
    # (see scripts/bench_trunk.py int8 probe) — the raw int32 output is
    # returned as float for the elementwise epilogue to rescale. NOTE:
    # the float32 return is exact only for accumulations with magnitude
    # < 2^24 (fp32 mantissa); with ±127 inputs that bound holds up to
    # ~1040 accumulation taps (kh*kw*Cin), which covers every conv in
    # this repo's int8 probes but is the caller's contract to respect.
    if weight.dtype == jnp.int8:
        # saturate, don't wrap: activations outside int8 range must clamp
        # to ±127 (astype alone wraps, sign-flipping large values) — for
        # integer inputs exactly as for floats
        x8 = (jnp.clip(jnp.round(x), -127.0, 127.0).astype(jnp.int8)
              if jnp.issubdtype(x.dtype, jnp.floating)
              else jnp.clip(x, -127, 127).astype(jnp.int8))
        out = lax.conv_general_dilated(
            x8,
            weight,
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            rhs_dilation=dilation,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        out = lax.conv_general_dilated(
            x.astype(weight.dtype),
            weight,
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            rhs_dilation=dilation,
        )
    if bias is not None:
        out = out + bias
    return out


def batch_norm(x, p, train=False, axis_name=None):
    """BatchNorm2d with torch semantics (eps 1e-5, momentum 0.1).

    Args:
      x: (B, H, W, C)
      p: dict with 'weight', 'bias', 'running_mean', 'running_var'.
      train: use batch statistics and return updated running stats.
      axis_name: optional mesh axis to pmean the batch moments over
        (cross-device synchronized BN for data-parallel training).

    Returns (y, new_stats) where new_stats is None in eval mode and a dict
    of updated running_mean/running_var in train mode.
    """
    if not train:
        mean, var = p["running_mean"], p["running_var"]
        new_stats = None
    else:
        # moments always accumulate in fp32 (bf16 activations under the
        # mixed-precision training policy would lose ~2 digits in the
        # H*W*B-term sums)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean_sq = jnp.mean(xf * xf, axis=(0, 1, 2))
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
        var = mean_sq - mean * mean
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            n = n * lax.psum(1, axis_name)
        # torch updates running_var with the *unbiased* batch variance
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "running_mean": (1 - BN_MOMENTUM) * p["running_mean"]
            + BN_MOMENTUM * mean,
            "running_var": (1 - BN_MOMENTUM) * p["running_var"]
            + BN_MOMENTUM * unbiased,
        }
    inv = lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * p["weight"] + p["bias"]
    return y, new_stats


def max_pool(x, window, stride, padding=0):
    """Max pool with -inf padding (torch semantics)."""
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=pads,
    )


def l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2): x / max(||x||_2, eps).

    The squared-sum always accumulates in fp32 (matters when features are
    bf16 — 256-term sums lose ~2 digits otherwise)."""
    sq = jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=axis, keepdims=True
    )
    norm = jnp.sqrt(sq).astype(x.dtype)
    return x / jnp.maximum(norm, jnp.asarray(eps, x.dtype))


# ---------------------------------------------------------------------------
# initializers (torch-matching)
# ---------------------------------------------------------------------------


def kaiming_normal_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out', nonlinearity='relu') for conv weights.

    fan_out = kh * kw * cout; std = sqrt(2 / fan_out). HWIO layout.
    """
    std = math.sqrt(2.0 / (kh * kw * cout))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def bn_init(c, dtype=jnp.float32):
    return {
        "weight": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "running_mean": jnp.zeros((c,), dtype),
        "running_var": jnp.ones((c,), dtype),
    }


def cast_params(params, dtype):
    """Cast all floating-point leaves of a param tree (e.g. to bfloat16 for
    the throughput path; keep fp32 for strict reference parity)."""
    import jax

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


def cast_compute_params(params, dtype):
    """Mixed-precision compute cast: cast float leaves to `dtype`, EXCEPT
    BatchNorm subtrees (identified by a 'running_mean' sibling), which stay
    in their master precision — BN is elementwise/HBM-bound, and its
    running-stat updates must not round-trip through bf16.

    With fp32 master params and dtype=bfloat16 this makes every conv run
    bf16 on the MXU while grads (through the cast) come back fp32.
    """
    if isinstance(params, dict):
        if "running_mean" in params:
            return params
        return {k: cast_compute_params(v, dtype) for k, v in params.items()}
    if hasattr(params, "dtype") and jnp.issubdtype(params.dtype, jnp.floating):
        return params.astype(dtype)
    return params


def merge_bn_stats(params, stats):
    """Fold a {path: {running_mean, running_var}} update back into params.

    `stats` mirrors the nesting of `params` but only contains BN stat leaves;
    produced by apply functions in train mode.
    """
    if stats is None:
        return params
    merged = dict(params)
    for k, v in stats.items():
        if k in ("running_mean", "running_var"):
            merged[k] = v
        else:
            merged[k] = merge_bn_stats(params.get(k, {}), v)
    return merged
