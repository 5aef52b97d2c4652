"""Training subsystem tests: losses, train step, data-parallel step on the
8-device virtual CPU mesh, data pipeline, checkpointing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ransacflow_tpu.pipeline import init_alignment_params
from ransacflow_tpu.train import (
    compute_losses,
    margin_mask,
    make_train_step,
    make_data_parallel_step,
    local_index_roll,
    PairFolder,
    save_checkpoint,
    load_checkpoint,
)
from ransacflow_tpu.parallel import make_mesh, replicate, shard_batch
from ransacflow_tpu.ops import normalized_grid

IMG = 32
MARGIN = 8


@pytest.fixture(scope="module")
def params():
    return init_alignment_params(jax.random.PRNGKey(0))


def _batch(rng, b):
    imgs = rng.rand(2 * b, IMG, IMG, 3).astype(np.float32)
    return (
        jnp.asarray(imgs),
        local_index_roll(b),
        normalized_grid(IMG, IMG)[None],
        margin_mask(2 * b, IMG, MARGIN),
    )


def test_margin_mask_matches_reference_shape():
    m = np.asarray(margin_mask(4, 224, 88))
    assert m.shape == (4, 224, 224, 1)
    assert m.sum() == 4 * 48 * 48  # only the central 48x48 is supervised
    assert m[0, 87, 100, 0] == 0 and m[0, 88, 100, 0] == 1


@pytest.mark.parametrize("mode", ["flow", "flow+match", "grad"])
def test_losses_finite_and_mode_terms(rng, params, mode):
    imgs, roll, grid, mask = _batch(rng, 2)
    loss, aux = compute_losses(
        params, imgs, roll, grid, mask, mode=mode,
        mu_cycle=1.0, lambda_match=0.01, grad_weight=1.0, train=True,
    )
    assert np.isfinite(float(loss))
    if mode == "flow":
        assert float(aux["loss_match"]) == 0.0
        assert float(aux["loss_grad"]) == 0.0
    else:
        assert float(aux["loss_match"]) > 0.0
        assert "netFeatCoarse" in aux["bn_stats"] or mode == "grad"
    if mode == "grad":
        # only the flow net trains -> no feat-net BN stat updates
        assert "netFeatCoarse" not in aux["bn_stats"]


def test_train_step_updates_only_trainable(rng, params):
    init_opt, step = make_train_step(mode="flow", mu_cycle=1.0)
    opt_state = init_opt(params)
    imgs, roll, grid, mask = _batch(rng, 2)
    step_j = jax.jit(step)
    new_params, _, metrics = step_j(params, opt_state, imgs, roll, grid, mask)
    assert np.isfinite(float(metrics["loss"]))
    # flow mode: netMatch untouched, netFeatCoarse conv changed
    a = np.asarray(params["netMatch"]["conv1"]["weight"])
    b = np.asarray(new_params["netMatch"]["conv1"]["weight"])
    np.testing.assert_array_equal(a, b)
    a = np.asarray(params["netFeatCoarse"]["conv1"]["weight"])
    b = np.asarray(new_params["netFeatCoarse"]["conv1"]["weight"])
    assert np.abs(a - b).max() > 0
    # BN running stats of trained nets were refreshed
    assert np.abs(
        np.asarray(new_params["netFeatCoarse"]["bn1"]["running_mean"])
        - np.asarray(params["netFeatCoarse"]["bn1"]["running_mean"])
    ).max() > 0


def test_train_step_remat_matches_plain(rng, params):
    """jax.checkpoint on the feature trunk changes memory, not numerics:
    one step with remat=True produces the same loss and updated params as
    the plain step."""
    imgs, roll, grid, mask = _batch(rng, 2)
    outs = []
    for remat in (False, True):
        init_opt, step = make_train_step(mode="flow+match", mu_cycle=1.0,
                                         lambda_match=0.01, grad_weight=1.0,
                                         remat=remat)
        opt_state = init_opt(params)
        p, _, metrics = jax.jit(step)(params, opt_state, imgs, roll, grid,
                                      mask)
        outs.append((p, float(metrics["loss"])))
    (p0, l0), (p1, l1) = outs
    assert np.isclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_loss_decreases(rng, params):
    init_opt, step = make_train_step(mode="flow", mu_cycle=0.0, lr=1e-3)
    opt_state = init_opt(params)
    imgs, roll, grid, mask = _batch(rng, 2)
    step_j = jax.jit(step)
    p = params
    losses = []
    for _ in range(12):
        p, opt_state, metrics = step_j(p, opt_state, imgs, roll, grid, mask)
        losses.append(float(metrics["loss"]))
    # single-step endpoints are noisy at this tiny scale; compare plateaus
    assert np.mean(losses[6:]) < np.mean(losses[:2])


def test_data_parallel_step_matches_single_device(rng, params):
    """DP over 8 virtual devices == single-device step on the full batch."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    b_local = 1
    b_global = 8 * b_local
    imgs = rng.rand(2 * b_global, IMG, IMG, 3).astype(np.float32)
    # device layout: shard d must hold concat(I1_d, I2_d); build interleaved
    i1, i2 = imgs[:b_global], imgs[b_global:]
    shards = []
    for d in range(8):
        shards.append(i1[d * b_local : (d + 1) * b_local])
        shards.append(i2[d * b_local : (d + 1) * b_local])
    imgs_dp = np.concatenate(shards)

    roll_local = local_index_roll(b_local)
    grid = normalized_grid(IMG, IMG)[None]
    mask_local = margin_mask(2 * b_local, IMG, MARGIN)
    mask_dp = jnp.tile(mask_local, (8, 1, 1, 1))

    init_opt, step_single = make_train_step(mode="flow", mu_cycle=1.0)
    opt_state = init_opt(params)

    dp_step = make_data_parallel_step(mesh, mode="flow", mu_cycle=1.0)
    p_r = replicate(params, mesh)
    o_r = replicate(opt_state, mesh)
    new_p_dp, _, m_dp = dp_step(
        p_r, o_r, shard_batch(jnp.asarray(imgs_dp), mesh), roll_local,
        replicate(grid, mesh), shard_batch(mask_dp, mesh),
    )

    # single-device equivalent: batch = all pairs, global roll
    roll_global = local_index_roll(b_global)
    imgs_single = jnp.asarray(imgs)
    mask_single = margin_mask(2 * b_global, IMG, MARGIN)
    new_p_s, _, m_s = jax.jit(step_single)(
        params, opt_state, imgs_single, roll_global, grid, mask_single
    )

    # losses are means over equal-sized shards -> DP mean == global mean
    np.testing.assert_allclose(
        float(m_dp["loss_lr"]), float(m_s["loss_lr"]), rtol=2e-3
    )
    # parameters after one step agree (psum'd grads == global grads).
    # Adam's first step is +-lr * sign(grad), so fp-noise on near-zero
    # gradients can flip isolated updates by 2*lr — tolerate a small
    # fraction of those, require everything else tight.
    a = np.asarray(new_p_dp["netFlowCoarse"]["conv4"]["weight"])
    b = np.asarray(new_p_s["netFlowCoarse"]["conv4"]["weight"])
    mismatched = np.abs(a - b) > 1e-5
    assert mismatched.mean() < 0.02, f"{mismatched.mean():.3%} weights differ"
    # synced BN running stats agree with global-batch stats
    a = np.asarray(new_p_dp["netFeatCoarse"]["bn1"]["running_mean"])
    b = np.asarray(new_p_s["netFeatCoarse"]["bn1"]["running_mean"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pair_folder_and_transform(rng, tmp_path):
    from PIL import Image

    for idx in range(3):
        for v in (1, 2):
            arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{idx}_{v}.jpg")
    folder = PairFolder(str(tmp_path), img_size=32, seed=0)
    assert len(folder) == 3 and folder.cycle == 2
    batches = list(folder.epoch_batches(batch_size=2))
    assert len(batches) == 1
    assert batches[0]["I1"].shape == (2, 32, 32, 3)
    assert batches[0]["I1"].dtype == np.float32
    assert 0.0 <= batches[0]["I1"].min() and batches[0]["I1"].max() <= 1.0


def test_checkpoint_roundtrip(tmp_path, params):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, step=7)
    restored = load_checkpoint(path)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["netFlowCoarse"]["conv1"]["weight"]),
        np.asarray(params["netFlowCoarse"]["conv1"]["weight"]),
    )


def test_pair_folder_host_sharding(rng, tmp_path):
    """shard_index/num_shards split (the DistributedSampler equivalent,
    SURVEY §2.9): shards COVER the groups and are all the SAME length —
    the lock-step psum'd DP steps deadlock if one rank runs fewer epoch
    batches, so uneven group counts are padded by wrapping, exactly like
    the reference's DistributedSampler (segNet/lib/utils/data/
    distributed.py:23-38)."""
    from PIL import Image

    for idx in range(5):
        for v in (1, 2):
            Image.fromarray(
                (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            ).save(tmp_path / f"{idx}_{v}.jpg")
    a = PairFolder(str(tmp_path), img_size=8, shard_index=0, num_shards=2)
    b = PairFolder(str(tmp_path), img_size=8, shard_index=1, num_shards=2)
    # full cover, equal lengths (5 groups -> 3+3 with ONE wrap duplicate)
    assert set(a.indices) | set(b.indices) == set(range(5))
    assert len(a.indices) == len(b.indices) == 3
    all_idx = a.indices + b.indices
    assert len(all_idx) - len(set(all_idx)) == 1  # exactly the padding
    # equal shard length => equal per-epoch batch counts on every rank
    assert (len(list(a.epoch_batches(2))) == len(list(b.epoch_batches(2)))
            == 1)
    # even split stays an exact disjoint partition (no padding)
    for idx in (5, 6, 7):
        for v in (1, 2):
            Image.fromarray(
                (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            ).save(tmp_path / f"{idx}_{v}.jpg")
    c = PairFolder(str(tmp_path), img_size=8, shard_index=0, num_shards=2)
    d = PairFolder(str(tmp_path), img_size=8, shard_index=1, num_shards=2)
    assert sorted(c.indices + d.indices) == list(range(8))
    assert not set(c.indices) & set(d.indices)


def test_train_step_bf16_policy(rng, params):
    """Mixed-precision policy: fp32 masters stay fp32, loss tracks the fp32
    trajectory, and training still converges."""
    imgs, roll, grid, mask = _batch(rng, 2)
    trajs = {}
    for dt in (None, "bfloat16"):
        init_opt, step = make_train_step(
            mode="flow+match", mu_cycle=1.0, lambda_match=0.01,
            grad_weight=1.0, lr=1e-3, compute_dtype=dt,
        )
        p, o = params, init_opt(params)
        step_j = jax.jit(step)
        losses = []
        for _ in range(10):
            p, o, m = step_j(p, o, imgs, roll, grid, mask)
            losses.append(float(m["loss"]))
        trajs[dt] = losses
        leaf = p["netFeatCoarse"]["conv1"]["weight"]
        assert leaf.dtype == jnp.float32
        assert p["netFeatCoarse"]["bn1"]["running_mean"].dtype == jnp.float32
        assert all(np.isfinite(losses))
    # the first loss (same params, fresh batch stats) must agree tightly;
    # later steps drift chaotically (Adam's sign-like first steps amplify
    # any rounding), so only convergence is asserted beyond step 0
    assert abs(trajs[None][0] - trajs["bfloat16"][0]) < 5e-3
    assert np.mean(trajs["bfloat16"][6:]) < np.mean(trajs["bfloat16"][:2])


def test_data_parallel_step_bf16_matches_single_device(rng, params):
    """DP equivalence holds under the bf16 compute policy too."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    b_local = 1
    b_global = 8 * b_local
    imgs = rng.rand(2 * b_global, IMG, IMG, 3).astype(np.float32)
    i1, i2 = imgs[:b_global], imgs[b_global:]
    shards = []
    for d in range(8):
        shards.append(i1[d * b_local : (d + 1) * b_local])
        shards.append(i2[d * b_local : (d + 1) * b_local])
    imgs_dp = np.concatenate(shards)

    roll_local = local_index_roll(b_local)
    grid = normalized_grid(IMG, IMG)[None]
    mask_dp = jnp.tile(margin_mask(2 * b_local, IMG, MARGIN), (8, 1, 1, 1))

    kwargs = dict(mode="flow", mu_cycle=1.0, compute_dtype="bfloat16")
    init_opt, step_single = make_train_step(**kwargs)
    opt_state = init_opt(params)
    dp_step = make_data_parallel_step(mesh, **kwargs)
    new_p_dp, _, m_dp = dp_step(
        replicate(params, mesh), replicate(opt_state, mesh),
        shard_batch(jnp.asarray(imgs_dp), mesh), roll_local,
        replicate(grid, mesh), shard_batch(mask_dp, mesh),
    )
    new_p_s, _, m_s = jax.jit(step_single)(
        params, opt_state, jnp.asarray(imgs), local_index_roll(b_global),
        grid, margin_mask(2 * b_global, IMG, MARGIN),
    )
    # bf16 batch moments differ per-shard slightly more than fp32; keep the
    # same structural assertions with looser fp tolerances
    np.testing.assert_allclose(
        float(m_dp["loss_lr"]), float(m_s["loss_lr"]), rtol=1e-2
    )
    a = np.asarray(new_p_dp["netFlowCoarse"]["conv4"]["weight"])
    b = np.asarray(new_p_s["netFlowCoarse"]["conv4"]["weight"])
    mismatched = np.abs(a - b) > 1e-5
    assert mismatched.mean() < 0.05, f"{mismatched.mean():.3%} weights differ"
    a = np.asarray(new_p_dp["netFeatCoarse"]["bn1"]["running_mean"])
    b = np.asarray(new_p_s["netFeatCoarse"]["bn1"]["running_mean"])
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_process_shard_layout_math():
    """Multi-host DP layout (SURVEY §2.9, VERDICT r4 missing #2): every
    process gets an equal batch share covering an equal mesh span, and
    invalid grids are rejected loudly."""
    from ransacflow_tpu.train.loop import process_shard_layout

    # 4 hosts x 8 devices, global batch 64
    host_batch, local_devices = process_shard_layout(64, 32, 3, 4)
    assert (host_batch, local_devices) == (16, 8)
    # shares tile the global batch/device grid exactly
    assert host_batch * 4 == 64 and local_devices * 4 == 32
    # single host degenerates to the local layout
    assert process_shard_layout(16, 8, 0, 1) == (16, 8)

    with pytest.raises(ValueError):
        process_shard_layout(64, 30, 0, 4)   # devices not divisible
    with pytest.raises(ValueError):
        process_shard_layout(62, 32, 0, 4)   # batch not divisible by devices
    with pytest.raises(ValueError):
        process_shard_layout(64, 32, 4, 4)   # index out of range


def test_fit_rejects_multiprocess_without_mesh(tmp_path, params):
    from ransacflow_tpu.train.loop import fit

    with pytest.raises(ValueError, match="device mesh"):
        fit(params, str(tmp_path), str(tmp_path / "out"),
            n_devices=1, process_index=0, process_count=2)


def test_fit_rejects_multiprocess_local_device_count(tmp_path, params):
    """Passing the LOCAL device count under multi-process (the natural
    single-host habit) must fail at the front door: make_mesh(n) would
    take the first n GLOBAL devices and exclude other ranks' chips."""
    from ransacflow_tpu.train.loop import fit

    assert jax.device_count() == 8
    with pytest.raises(ValueError, match="GLOBAL device set"):
        fit(params, str(tmp_path), str(tmp_path / "out"),
            n_devices=4, process_index=0, process_count=2)


def test_data_parallel_step_on_permuted_device_mesh(rng, params):
    """DP correctness must not depend on the mesh's device list being the
    local default order (multi-host meshes enumerate other processes'
    devices too): a REVERSED device list yields the same psum'd step."""
    assert jax.device_count() >= 8
    b_local = 1
    imgs = rng.rand(2 * 8, IMG, IMG, 3).astype(np.float32)
    i1, i2 = imgs[:8], imgs[8:]
    shards = []
    for d in range(8):
        shards.append(i1[d : d + 1])
        shards.append(i2[d : d + 1])
    imgs_dp = np.concatenate(shards)
    roll = local_index_roll(b_local)
    grid = normalized_grid(IMG, IMG)[None]
    mask_dp = jnp.tile(margin_mask(2 * b_local, IMG, MARGIN), (8, 1, 1, 1))

    init_opt, _ = make_train_step(mode="flow", mu_cycle=1.0)
    opt_state = init_opt(params)

    losses = {}
    for name, devs in (("default", None),
                       ("reversed", list(reversed(jax.devices()[:8])))):
        mesh = make_mesh(8, devices=devs)
        dp_step = make_data_parallel_step(mesh, mode="flow", mu_cycle=1.0)
        _, _, m = dp_step(
            replicate(params, mesh), replicate(opt_state, mesh),
            shard_batch(jnp.asarray(imgs_dp), mesh), roll,
            replicate(grid, mesh), shard_batch(mask_dp, mesh),
        )
        losses[name] = float(m["loss_lr"])
    # psum is order-invariant; the per-shard data-to-device assignment
    # differs but the global mean/grads are identical
    np.testing.assert_allclose(losses["default"], losses["reversed"],
                               rtol=1e-5)
