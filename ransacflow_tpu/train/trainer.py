"""Training step construction: Adam over per-mode trainable subsets,
single-device or data-parallel over a device mesh.

Mirrors the reference's optimizer wiring (train/train.py:151-177): Adam
lr 2e-4, betas (0.5, 0.999); the trainable subset depends on the mode. The
reference's two separate Adam instances in 'flow+match' are equivalent to
one Adam over the union (Adam is per-parameter).

Data parallelism is shard_map over a 1-D mesh: batch sharded on 'data',
params replicated, gradients psum-averaged, BatchNorm moments pmean'd
inside the forward (the TPU-native sync-BN — SURVEY.md §2.9).
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ransacflow_tpu.train.losses import compute_losses, TRAIN_MODULES
from ransacflow_tpu.models.layers import merge_bn_stats


def make_optimizer(lr=2e-4):
    return optax.adam(lr, b1=0.5, b2=0.999)


def split_trainable(params, mode):
    """(trainable, frozen) param subsets for a loss mode."""
    trained = TRAIN_MODULES[mode]
    trainable = {k: v for k, v in params.items() if k in trained}
    frozen = {k: v for k, v in params.items() if k not in trained}
    return trainable, frozen


def make_train_step(
    mode="flow",
    mu_cycle=0.0,
    lambda_match=0.01,
    grad_weight=0.0,
    kernel_size=7,
    lr=2e-4,
    axis_name=None,
    compute_dtype=None,
    remat=False,
):
    """Build (init_opt_state, step_fn).

    step_fn(params, opt_state, images, index_roll, grid, mask_margin) ->
      (new_params, new_opt_state, metrics dict). Pure; jit/shard_map it at
    the call site (see `make_data_parallel_step`).

    compute_dtype: optional mixed-precision policy ('bfloat16' or a jnp
    dtype): fp32 master weights + Adam state, conv compute in the given
    dtype, fp32 loss/BN-stat accumulation (see compute_losses). Gradients
    flow through the cast and arrive fp32.

    remat: rematerialize the feature trunk in backward (see
    compute_losses) — same numerics, one extra trunk forward, much smaller
    activation footprint for large batches/crops.
    """
    if isinstance(compute_dtype, str):
        compute_dtype = jnp.dtype(compute_dtype)
    opt = make_optimizer(lr)

    def init_opt_state(params):
        trainable, _ = split_trainable(params, mode)
        return opt.init(trainable)

    def step_fn(params, opt_state, images, index_roll, grid, mask_margin):
        trainable, frozen = split_trainable(params, mode)

        def loss_fn(trainable_params):
            full = {**frozen, **trainable_params}
            return compute_losses(
                full,
                images,
                index_roll,
                grid,
                mask_margin,
                mode=mode,
                mu_cycle=mu_cycle,
                lambda_match=lambda_match,
                grad_weight=grad_weight,
                kernel_size=kernel_size,
                train=True,
                axis_name=axis_name,
                compute_dtype=compute_dtype,
                remat=remat,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        if axis_name is not None:
            # the loss terms are *global* ratios (psum'd numerators and
            # denominators inside compute_losses), so each shard's grad is a
            # partial contribution — psum reconstructs the exact global
            # gradient, making DP bit-equivalent to one big batch.
            grads = jax.lax.psum(grads, axis_name)
        updates, new_opt_state = opt.update(grads, opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = {**frozen, **new_trainable}
        new_params = merge_bn_stats(new_params, aux["bn_stats"])
        metrics = {
            "loss": loss,
            "loss_lr": aux["loss_lr"],
            "loss_cycle": aux["loss_cycle"],
            "loss_match": aux["loss_match"],
            "loss_grad": aux["loss_grad"],
        }
        return new_params, new_opt_state, metrics

    return init_opt_state, step_fn


def make_data_parallel_step(mesh, **kwargs):
    """Wrap a train step in shard_map over `mesh` axis 'data', jitted.

    Batch arrays (images, index_roll, mask_margin) are sharded on their
    leading axis; params/opt state replicated; returned metrics replicated.

    The shard_map MUST be wrapped in jax.jit: called eagerly it executes
    the step op-by-op through the dispatch path (measured 341 s vs 25 s
    trace+compile+run for the same step on an 8-device CPU mesh). No
    buffer donation: `replicate()` (device_put to a replicated sharding)
    can alias the caller's buffers, so donating params/opt_state here
    would delete the caller's originals.

    NOTE on index_roll: with the batch sharded, the pairing permutation must
    stay shard-local — build batches so each device's shard holds B_local
    pairs as concat(I1_local, I2_local) and pass the local roll
    (roll(arange(2*B_local), B_local)).
    """
    _, step_fn = make_train_step(axis_name="data", **kwargs)

    sharded = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P(), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def local_index_roll(batch_size):
    """roll(arange(2B), B) — pairs image i with its counterpart
    (reference: train/train.py:219-223)."""
    import numpy as np

    return jnp.asarray(np.roll(np.arange(2 * batch_size), batch_size))
