"""Training driver: epochs, validation-gated checkpointing, curriculum.

Mirrors the reference's run() (train/train.py:116-313): per-epoch loss
averages, MegaDepth validation each epoch when a CSV is given (best model
kept on prec@8px, renamed with the score at the end), periodic checkpoints
otherwise, warm-start resume. The three-stage curriculum presets mirror
train/stage{1,2,3}.sh.
"""

import os
import pickle

import numpy as np
import jax

from ransacflow_tpu.train.trainer import (
    make_train_step,
    make_data_parallel_step,
    local_index_roll,
)
from ransacflow_tpu.train.losses import margin_mask
from ransacflow_tpu.train.data import PairFolder, prefetch
from ransacflow_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from ransacflow_tpu.train.validation import validate
from ransacflow_tpu.utils.monitor import MetricsLogger
from ransacflow_tpu.ops.grid import normalized_grid
from ransacflow_tpu.parallel.mesh import make_mesh, replicate, shard_batch

# stage presets (reference train/stage{1,2,3}.sh): mode, mu_cycle,
# lambda_match, grad, epochs
STAGES = {
    1: dict(mode="flow", mu_cycle=0.0, lambda_match=0.0, grad_weight=0.0,
            epochs=200),
    2: dict(mode="flow", mu_cycle=1.0, lambda_match=0.0, grad_weight=0.0,
            epochs=50),
    3: dict(mode="flow+match", mu_cycle=1.0, lambda_match=0.01,
            grad_weight=0.0, epochs=50),
}


def fit(
    params,
    train_dir,
    out_dir,
    mode="flow",
    mu_cycle=0.0,
    lambda_match=0.01,
    grad_weight=0.0,
    epochs=150,
    batch_size=16,
    img_size=224,
    margin=88,
    lr=2e-4,
    kernel_size=7,
    val_csv=None,
    val_dir=None,
    val_coarse_pkl=None,
    val_min_size=480,
    epoch_save_model=10,
    n_devices=1,
    seed=0,
    log_every=50,
    max_steps_per_epoch=None,
    compute_dtype=None,
    remat=False,
):
    """Train the alignment nets. Returns (params, best_prec).

    compute_dtype='bfloat16' enables the mixed-precision policy (fp32
    master weights, bf16 conv compute — see make_train_step).
    """
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir)

    loss_kwargs = dict(mode=mode, mu_cycle=mu_cycle,
                       lambda_match=lambda_match, grad_weight=grad_weight,
                       kernel_size=kernel_size, lr=lr,
                       compute_dtype=compute_dtype, remat=remat)
    init_opt, step_fn = make_train_step(**loss_kwargs)
    opt_state = init_opt(params)

    if n_devices > 1:
        mesh = make_mesh(n_devices)
        dp_step = make_data_parallel_step(mesh, **loss_kwargs)
        assert batch_size % n_devices == 0
        b_local = batch_size // n_devices
        roll = local_index_roll(b_local)
    else:
        mesh = None
        # params/opt_state are consumed each step — donating them lets XLA
        # update weights in place instead of allocating fresh buffers
        step_jit = jax.jit(step_fn, donate_argnums=(0, 1))
        roll = local_index_roll(batch_size)

    grid = normalized_grid(img_size, img_size)[None]
    mask = margin_mask(2 * (batch_size // n_devices if mesh else batch_size),
                       img_size, margin)

    folder = PairFolder(train_dir, img_size=img_size, seed=seed)
    df = None
    coarse_transforms = None
    if val_csv:
        import pandas as pd

        df = pd.read_csv(val_csv, dtype=str)
        with open(val_coarse_pkl, "rb") as f:
            coarse_transforms = pickle.load(f)

    best_prec = 0.0
    best_path = os.path.join(out_dir, "BestModel")
    last_update = 0

    if mesh is not None:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        grid_dev = replicate(grid, mesh)
        mask_dev = shard_batch(
            np.tile(np.asarray(mask), (n_devices, 1, 1, 1)), mesh
        )

    for epoch in range(epochs):
        sums = {}
        n_steps = 0
        for batch in prefetch(folder.epoch_batches(batch_size)):
            if mesh is not None:
                # interleave so each shard holds concat(I1_d, I2_d)
                i1, i2 = batch["I1"], batch["I2"]
                shards = []
                for d in range(n_devices):
                    shards.append(i1[d * b_local : (d + 1) * b_local])
                    shards.append(i2[d * b_local : (d + 1) * b_local])
                imgs = np.concatenate(shards)
                params, opt_state, metrics = dp_step(
                    params, opt_state,
                    shard_batch(imgs, mesh), roll, grid_dev, mask_dev,
                )
            else:
                imgs = np.concatenate([batch["I1"], batch["I2"]])
                params, opt_state, metrics = step_jit(
                    params, opt_state, imgs, roll, grid, mask
                )
            n_steps += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if n_steps % log_every == 0:
                logger.log(epoch * 10000 + n_steps,
                           **{k: v / n_steps for k, v in sums.items()})
            if max_steps_per_epoch and n_steps >= max_steps_per_epoch:
                break

        avg = {k: v / max(n_steps, 1) for k, v in sums.items()}

        if df is not None:
            prec = validate(df, val_dir, coarse_transforms, params,
                            kernel_size=kernel_size, min_size=val_min_size)
            prec8 = float(prec[4])
        else:
            prec = np.zeros(8)
            prec8 = 0.0
        logger.log(epoch, val_prec8=prec8, **avg)

        if df is not None and prec8 > best_prec:
            best_prec = prec8
            last_update = epoch
            save_checkpoint(best_path, params, opt_state, step=epoch)
            print(f"epoch {epoch}: val prec@8 improved to {prec8:.4f}")
        elif df is None and (epoch + 1) % epoch_save_model == 0:
            ckpt = os.path.join(out_dir, f"checkpoint_epoch{epoch}")
            save_checkpoint(ckpt, params, opt_state, step=epoch)

    if df is not None and os.path.exists(best_path):
        final = os.path.join(out_dir, f"BestModel@8_{best_prec:.3f}")
        os.rename(best_path, final)
    return params, best_prec


def resume_params(resume_path, params):
    """Warm start: merge a checkpoint into `params` with per-module
    tolerance for mismatches (reference: train/train.py:140-149). Accepts
    orbax dirs and reference .pth files."""
    if resume_path.endswith(".pth"):
        from ransacflow_tpu.models.convert import load_alignment_checkpoint

        loaded = load_alignment_checkpoint(resume_path)
    else:
        loaded = load_checkpoint(resume_path)["params"]
    out = dict(params)
    for key, tree in loaded.items():
        if key not in out:
            continue
        try:
            # shape-check against the existing tree
            jax.tree.map(lambda a, b: np.broadcast_shapes(a.shape, b.shape),
                         out[key], tree)
            out[key] = tree
        except Exception:
            print(f"{key} weights not compatible, keeping init")
    return out
