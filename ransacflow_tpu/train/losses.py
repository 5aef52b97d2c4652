"""Self-supervised training losses (reference: train/train.py:31-114).

A batch is ``I = concat(I1, I2)`` of 2B images; ``index_roll`` pairs image i
with its counterpart, so both flow directions are computed in one forward
pass. Three loss modes mirror the reference's curriculum:

- 'flow'       (stages 1-2): SSIM reconstruction + cycle consistency,
               no matchability (train/train.py:69-90).
- 'flow+match' (stage 3): matchability-weighted SSIM/cycle + matchability
               + flow-gradient losses (train/train.py:31-65).
- 'grad'       (visuals fine-tune): same as 'flow+match' but only the flow
               net is trainable (the wiring at train/train.py:171-177 uses
               computeLossMatchability; computeGradLossNoMatchability at
               :92-114 is dead code).

Module train/eval mode and gradient flow per mode follow the reference: a
module outside `trainModule` runs in eval BN mode AND under stop_gradient
(its torch forward wraps no_grad when not training, model/model.py:117-124).
"""

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.feature_extractor import feature_extractor
from ransacflow_tpu.models.heads import (
    net_flow_coarse,
    net_matchability,
    flow_gradient_magnitude,
    flow_to_grid,
)
from ransacflow_tpu.models.layers import l2_normalize, cast_compute_params
from ransacflow_tpu.ops.correlation import correlation_volume
from ransacflow_tpu.ops.sampler import grid_sample
from ransacflow_tpu.ops.ssim import masked_ssim_loss

TRAIN_MODULES = {
    "flow": ("netFeatCoarse", "netFlowCoarse"),
    "flow+match": ("netFeatCoarse", "netFlowCoarse", "netMatch"),
    "grad": ("netFlowCoarse",),
}


def margin_mask(batch2, img_size, margin, dtype=jnp.float32):
    """(2B, H, W, 1) ones on the central square, zero border
    (reference: train/train.py:182-184)."""
    m = jnp.zeros((batch2, img_size, img_size, 1), dtype)
    return m.at[:, margin : img_size - margin, margin : img_size - margin].set(1.0)


def compute_losses(
    params,
    images,
    index_roll,
    grid,
    mask_margin,
    mode="flow",
    mu_cycle=1.0,
    lambda_match=0.01,
    grad_weight=0.0,
    kernel_size=7,
    train=True,
    axis_name=None,
    compute_dtype=None,
    remat=False,
):
    """Returns (total_loss, aux) with aux = dict(loss terms + bn stats).

    Args:
      params: dict of the three net param trees.
      images: (2B, H, W, 3) in [0, 1].
      index_roll: (2B,) permutation pairing each image with its counterpart.
      grid: (1, H, W, 2) normalized grid.
      mask_margin: (2B, H, W, 1) central-crop supervision mask.
      mode: 'flow' | 'flow+match' | 'grad'.
      compute_dtype: optional mixed-precision compute dtype (e.g.
        jnp.bfloat16): conv weights are cast so the CNNs run on the MXU in
        that dtype, while BN, flow/grid coordinates, warping and all loss
        arithmetic stay fp32 (bf16 grid coords would cost ~1 px of sampling
        precision at 224px).
      remat: rematerialize the feature-extractor trunk in the backward
        pass (jax.checkpoint) instead of storing its ~2B*H*W*256-element
        activation stack — trades one extra trunk forward for the largest
        activation footprint of the step, enabling bigger batches / larger
        crops per device.
    """
    trained = TRAIN_MODULES[mode]
    with_match = mode in ("flow+match", "grad")

    if compute_dtype is not None:
        params = cast_compute_params(params, compute_dtype)

    def maybe_frozen(name, out):
        if train and name not in trained:
            out = jax.lax.stop_gradient(out)
        return out

    stats = {}

    feat_train = train and "netFeatCoarse" in trained

    def trunk(p, im):
        return feature_extractor(p, im, train=feat_train,
                                 axis_name=axis_name)

    if remat:
        trunk = jax.checkpoint(trunk)
    f, s = trunk(params["netFeatCoarse"], images)
    if s:
        stats["netFeatCoarse"] = s
    f = l2_normalize(maybe_frozen("netFeatCoarse", f), axis=-1)

    corr = correlation_volume(f[index_roll], f, kernel_size)

    flow_train = train and "netFlowCoarse" in trained
    flow, s = net_flow_coarse(
        params["netFlowCoarse"], corr, up8=True, kernel_size=kernel_size,
        train=flow_train, axis_name=axis_name,
    )
    if s:
        stats["netFlowCoarse"] = s
    flow = maybe_frozen("netFlowCoarse", flow).astype(jnp.float32)

    flow_grad = flow_gradient_magnitude(flow)  # (2B, H-1, W-1, 1)
    final = flow_to_grid(flow, grid)           # (2B, H, W, 2)

    if with_match:
        match_train = train and "netMatch" in trained
        match, s = net_matchability(
            params["netMatch"], corr, up8=True, train=match_train,
            axis_name=axis_name,
        )
        if s:
            stats["netMatch"] = s
        match = maybe_frozen("netMatch", match).astype(jnp.float32) * mask_margin
        match_cycle = grid_sample(match[index_roll], final) * match
        cycle_weight = match_cycle
        recon_mask = match_cycle
    else:
        match_cycle = None
        cycle_weight = mask_margin
        recon_mask = mask_margin

    def ratio(num, den):
        """Sum-ratio loss; with a mesh axis, the ratio is global so DP
        training is exactly equivalent to a single large batch."""
        num, den = jnp.sum(num), jnp.sum(den)
        if axis_name is not None:
            num = jax.lax.psum(num, axis_name)
            den = jax.lax.psum(den, axis_name)
        return num / (den + 0.001)

    # cycle consistency: warping forward then backward must return to grid
    flow_c = grid_sample(final[index_roll], final)
    cycle_map = jnp.mean(jnp.abs(flow_c - grid), axis=-1, keepdims=True)
    loss_cycle = ratio(cycle_map * cycle_weight, cycle_weight)

    # masked SSIM reconstruction
    warped = grid_sample(images, final)
    loss_lr = masked_ssim_loss(warped, images[index_roll], recon_mask,
                               axis_name=axis_name)

    total = loss_lr + mu_cycle * loss_cycle
    if with_match:
        loss_match = ratio(jnp.abs(1.0 - match_cycle) * mask_margin, mask_margin)
        w = (1.0 - match_cycle[:, :-1, :-1, :]) * mask_margin[:, :-1, :-1, :]
        loss_grad = ratio(flow_grad * w, w)
        total = total + lambda_match * loss_match + grad_weight * loss_grad
    else:
        # 'flow' mode has neither matchability nor gradient terms
        # (reference: computeLossNoMatchability, train/train.py:69-90)
        loss_match = jnp.zeros(())
        loss_grad = jnp.zeros(())

    aux = {
        "loss_lr": loss_lr,
        "loss_cycle": loss_cycle,
        "loss_match": loss_match,
        "loss_grad": loss_grad,
        "bn_stats": stats,
    }
    return total, aux
