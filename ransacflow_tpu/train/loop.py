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


def process_shard_layout(batch_size, n_devices, process_index, process_count):
    """Validate + derive the per-process share of a multi-host DP layout.

    Returns (host_batch, local_devices): how many pairs this process loads
    per step and how many mesh devices its data covers. The device mesh is
    GLOBAL (jax.devices() under multi-process JAX lists all hosts'
    devices, process 0's first), so process p's host_batch rows land on
    mesh positions [p * local_devices, (p+1) * local_devices) — exactly
    the shards `jax.make_array_from_process_local_data` expects each
    process to provide. Pure shard math, unit-tested without multiple
    processes (tests/test_parallel.py).

    The reference's counterpart is the vendored DistributedSampler
    (segNet/lib/utils/data/distributed.py:7-57): rank-strided indices over
    one global dataset; here PairFolder(shard_index=process_index,
    num_shards=process_count) plays that role and this function sizes the
    per-rank batch.
    """
    if process_count < 1 or not 0 <= process_index < process_count:
        raise ValueError(
            f"bad process grid: index {process_index} of {process_count}")
    if n_devices % process_count:
        raise ValueError(
            f"n_devices ({n_devices}) must be divisible by the process "
            f"count ({process_count}) — every host contributes the same "
            f"number of mesh devices")
    if batch_size % n_devices:
        raise ValueError(
            f"batch_size ({batch_size}) must be divisible by n_devices "
            f"({n_devices})")
    local_devices = n_devices // process_count
    host_batch = batch_size // process_count
    return host_batch, local_devices

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
    use_native=False,
    process_index=None,
    process_count=None,
):
    """Train the alignment nets. Returns (params, best_prec).

    compute_dtype='bfloat16' enables the mixed-precision policy (fp32
    master weights, bf16 conv compute — see make_train_step).

    Multi-host (pod-slice) training: launch one process per host with
    `jax.distributed.initialize()` done first (cli/train.py --distributed)
    and n_devices = the GLOBAL device count. Each process then loads a
    disjoint rank-strided shard of the pair list (PairFolder
    shard_index/num_shards — the reference's DistributedSampler,
    segNet/lib/utils/data/distributed.py:7-57), feeds its local mesh
    shards via jax.make_array_from_process_local_data, and the psum'd DP
    step makes every process hold identical replicated params; process 0
    owns validation + checkpoints. process_index/process_count default to
    jax.process_index()/jax.process_count() — override only in tests.
    `batch_size` is always the GLOBAL batch.
    """
    if process_count is None:
        process_count = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    is_chief = process_index == 0
    if process_count > 1 and n_devices <= 1:
        raise ValueError(
            "multi-process training needs a device mesh: pass n_devices = "
            "the global device count (len(jax.devices()))")
    if process_count > 1 and n_devices != jax.device_count():
        # catch the natural single-host habit of passing the LOCAL count:
        # make_mesh(n) takes the first n GLOBAL devices, so a short count
        # builds a mesh excluding some processes' devices and those ranks
        # fail deep inside make_array_from_process_local_data mid-epoch
        raise ValueError(
            f"multi-process training shards the GLOBAL device set: pass "
            f"n_devices = len(jax.devices()) = {jax.device_count()}, got "
            f"{n_devices}")

    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(out_dir, echo=is_chief) if is_chief else None

    loss_kwargs = dict(mode=mode, mu_cycle=mu_cycle,
                       lambda_match=lambda_match, grad_weight=grad_weight,
                       kernel_size=kernel_size, lr=lr,
                       compute_dtype=compute_dtype, remat=remat)
    init_opt, step_fn = make_train_step(**loss_kwargs)
    opt_state = init_opt(params)

    host_batch, local_devices = process_shard_layout(
        batch_size, max(n_devices, 1), process_index, process_count)

    if n_devices > 1:
        mesh = make_mesh(n_devices)
        dp_step = make_data_parallel_step(mesh, **loss_kwargs)
        b_local = batch_size // n_devices
        roll = local_index_roll(b_local)
    else:
        mesh = None
        # params/opt_state are consumed each step — donating them lets XLA
        # update weights in place instead of allocating fresh buffers.
        # The FIRST step would donate the caller's own param buffers,
        # invalidating the tree the caller passed in (any later read hits
        # "Buffer has been deleted or donated") — copy once at entry so
        # donation only ever consumes fit-internal buffers.
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        opt_state = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), opt_state)
        step_jit = jax.jit(step_fn, donate_argnums=(0, 1))
        roll = local_index_roll(batch_size)

    grid = normalized_grid(img_size, img_size)[None]
    mask = margin_mask(2 * (batch_size // n_devices if mesh else batch_size),
                       img_size, margin)

    folder = PairFolder(train_dir, img_size=img_size, seed=seed,
                        shard_index=process_index, num_shards=process_count,
                        use_native=use_native)
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
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))

        def host_to_global(local_np):
            """This process's rows -> the global batch-sharded array."""
            if process_count == 1:
                return shard_batch(local_np, mesh)
            return jax.make_array_from_process_local_data(
                data_sharding, np.asarray(local_np))

        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        grid_dev = replicate(grid, mesh)
        mask_dev = host_to_global(
            np.tile(np.asarray(mask), (local_devices, 1, 1, 1))
        )

    for epoch in range(epochs):
        sums = {}
        n_steps = 0
        for batch in prefetch(folder.epoch_batches(host_batch)):
            if mesh is not None:
                # interleave so each LOCAL shard holds concat(I1_d, I2_d)
                i1, i2 = batch["I1"], batch["I2"]
                shards = []
                for d in range(local_devices):
                    shards.append(i1[d * b_local : (d + 1) * b_local])
                    shards.append(i2[d * b_local : (d + 1) * b_local])
                imgs = np.concatenate(shards)
                params, opt_state, metrics = dp_step(
                    params, opt_state,
                    host_to_global(imgs), roll, grid_dev, mask_dev,
                )
            else:
                imgs = np.concatenate([batch["I1"], batch["I2"]])
                params, opt_state, metrics = step_jit(
                    params, opt_state, imgs, roll, grid, mask
                )
            n_steps += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if logger and n_steps % log_every == 0:
                logger.log(epoch * 10000 + n_steps,
                           **{k: v / n_steps for k, v in sums.items()})
            if max_steps_per_epoch and n_steps >= max_steps_per_epoch:
                break

        avg = {k: v / max(n_steps, 1) for k, v in sums.items()}

        # validation + checkpoints are chief-only: params are replicated
        # (psum'd grads => identical on every process), so process 0's
        # copy IS the model; the other ranks just keep stepping
        if df is not None and is_chief:
            # under multi-process, hand validate() a host copy: its local
            # jits can't consume arrays committed to a global mesh
            p_eval = params if process_count == 1 else jax.device_get(params)
            prec = validate(df, val_dir, coarse_transforms, p_eval,
                            kernel_size=kernel_size, min_size=val_min_size)
            prec8 = float(prec[4])
        else:
            prec = np.zeros(8)
            prec8 = 0.0
        if logger:
            logger.log(epoch, val_prec8=prec8, **avg)

        if df is not None and is_chief and prec8 > best_prec:
            best_prec = prec8
            last_update = epoch
            save_checkpoint(best_path, params, opt_state, step=epoch)
            print(f"epoch {epoch}: val prec@8 improved to {prec8:.4f}")
        elif df is None and is_chief and (epoch + 1) % epoch_save_model == 0:
            ckpt = os.path.join(out_dir, f"checkpoint_epoch{epoch}")
            save_checkpoint(ckpt, params, opt_state, step=epoch)

    if df is not None and is_chief and os.path.exists(best_path):
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
