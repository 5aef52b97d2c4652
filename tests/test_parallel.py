"""Mesh-sharded paths on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ransacflow_tpu.parallel import (
    make_mesh,
    sharded_ransac,
    sharded_align_pairs,
)
from ransacflow_tpu.models import init_resnet50_layer3
from ransacflow_tpu.pipeline import init_alignment_params
from ransacflow_tpu.ops import apply_homography


def test_sharded_ransac_recovers_model(rng):
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    H = np.array([[1, 0, 0.3], [0, 1, -0.2], [0, 0, 1]], np.float32)
    m2 = (rng.rand(200, 2) * 1.6 - 0.8).astype(np.float32)
    m1 = np.asarray(apply_homography(jnp.asarray(H), jnp.asarray(m2)))
    ones = np.ones((200, 1), np.float32)
    res = sharded_ransac(
        mesh, jax.random.PRNGKey(0),
        jnp.asarray(np.concatenate([m1, ones], 1)),
        jnp.asarray(np.concatenate([m2, ones], 1)),
        jnp.ones(200, bool), tolerance=0.05, n_iter=2048,
    )
    assert bool(res.found)
    assert int(res.num_inliers) > 150
    Hn = np.asarray(res.H21, np.float64)
    Hn = Hn / Hn[2, 2]
    np.testing.assert_allclose(Hn, H, atol=5e-2)


def test_sharded_align_pairs_runs_on_mesh(rng):
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    resnet = init_resnet50_layer3(jax.random.PRNGKey(0))
    align = init_alignment_params(jax.random.PRNGKey(1))

    K = 8
    h = w = 64
    pyramids = (jnp.asarray(rng.rand(K, 1, h, w, 3).astype(np.float32)),)
    targets = jnp.asarray(rng.rand(K, 1, h, w, 3).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(2), K)
    out = sharded_align_pairs(
        mesh, resnet, align, pyramids, targets, keys, n_iter=256,
    )
    assert out["H21"].shape == (K, 3, 3)
    assert out["flow"].shape == (K, 1, h, w, 2)
    assert np.isfinite(np.asarray(out["H21"])).all()


def test_pooled_eval_identical_across_pool_sizes(rng):
    """eval/pooled.py: sharding pairs over a device pool must produce
    bit-identical artifacts to the 1-device run (per-pair fold_in keys make
    results dispatch-order independent) — VERDICT #7's done criterion."""
    from PIL import Image
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params
    from ransacflow_tpu.eval.pooled import pooled_multihomo_predict

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))

    h = w = 128

    def blocky():
        base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
        img = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
        return Image.fromarray((img * 255).astype(np.uint8))

    pil_pairs = [(blocky(), blocky()) for _ in range(4)]

    def run(n_devices):
        arts = {}
        pooled_multihomo_predict(
            ((i, s, t, None) for i, (s, t) in enumerate(pil_pairs)),
            resnet_params, align_params, n_devices,
            dict(nb_scale=1, n_iter=512, min_size=h),
            save_fn=lambda idx, art: arts.__setitem__(idx, art),
            max_coarse=2,
        )
        return arts

    seq = run(1)
    pooled = run(4)
    assert set(seq.keys()) == set(pooled.keys())
    for idx in seq:
        for k in ("coarse_h", "fine_flow_down8", "fine_match_down8"):
            np.testing.assert_array_equal(seq[idx][k], pooled[idx][k])


def test_pooled_batched_dispatch_bit_identical(rng):
    """eval/pooled.py BatchedMultiHomoDispatcher: grouping same-resized-shape
    pairs into `_fused_multi_homo_batch` dispatches must produce artifacts
    bit-identical to the per-pair pooled path (round-3 VERDICT #5's done
    criterion). 4 same-shape pairs, batch_pairs=2 -> two batched dispatches."""
    from PIL import Image
    from ransacflow_tpu.eval.pooled import pooled_multihomo_predict

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))

    h = w = 128

    def blocky(hh, ww):
        base = (rng.rand(hh // 4, ww // 4, 3) > 0.5).astype(np.float32)
        img = np.kron(base, np.ones((4, 4, 1), np.float32))[:hh, :ww]
        return Image.fromarray((img * 255).astype(np.uint8))

    pil_pairs = [(blocky(h, w), blocky(h, w)) for _ in range(4)]

    def run(batch_pairs):
        arts = {}
        pooled_multihomo_predict(
            ((i, s, t, None) for i, (s, t) in enumerate(pil_pairs)),
            resnet_params, align_params, 2,
            dict(nb_scale=1, n_iter=512, min_size=h),
            save_fn=lambda idx, art: arts.__setitem__(idx, art),
            max_coarse=2, batch_pairs=batch_pairs,
        )
        return arts

    per_pair = run(None)
    batched = run(2)
    assert set(per_pair.keys()) == set(batched.keys())
    for idx in per_pair:
        for k in ("coarse_h", "fine_flow_down8", "fine_match_down8",
                  "bg_mask"):
            np.testing.assert_array_equal(per_pair[idx][k], batched[idx][k])


def test_pooled_batched_dispatch_mixed_shapes(rng):
    """Mixed resized shapes land in separate buckets; a leftover singleton
    takes the per-pair `_fused_multi_homo` fallback at flush. Artifacts stay
    bit-identical to the per-pair path."""
    from PIL import Image
    from ransacflow_tpu.eval.pooled import pooled_multihomo_predict

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))

    def blocky(hh, ww):
        base = (rng.rand(hh // 4, ww // 4, 3) > 0.5).astype(np.float32)
        img = np.kron(base, np.ones((4, 4, 1), np.float32))[:hh, :ww]
        return Image.fromarray((img * 255).astype(np.uint8))

    # two square pairs (one full batch) + one wide pair (singleton bucket)
    pil_pairs = [
        (blocky(96, 96), blocky(96, 96)),
        (blocky(96, 96), blocky(96, 96)),
        (blocky(96, 128), blocky(96, 128)),
    ]

    def run(batch_pairs):
        arts = {}
        pooled_multihomo_predict(
            ((i, s, t, None) for i, (s, t) in enumerate(pil_pairs)),
            resnet_params, align_params, 2,
            dict(nb_scale=1, n_iter=512, min_size=96),
            save_fn=lambda idx, art: arts.__setitem__(idx, art),
            max_coarse=2, batch_pairs=batch_pairs,
        )
        return arts

    per_pair = run(None)
    batched = run(2)
    assert set(per_pair.keys()) == set(batched.keys())
    for idx in per_pair:
        for k in ("coarse_h", "fine_flow_down8", "fine_match_down8",
                  "bg_mask"):
            np.testing.assert_array_equal(per_pair[idx][k], batched[idx][k])


def test_pooled_yfcc_identical_across_pool_sizes(rng, tmp_path):
    """eval/yfcc.py pooled_yfcc_predict: full YFCC prediction (4-rotation
    pre-test + multi-homography loop) over a device pool yields artifacts
    bit-identical to the 1-device pool, including the stored rotation."""
    import pickle
    from PIL import Image
    from ransacflow_tpu.eval.yfcc import pooled_yfcc_predict
    from ransacflow_tpu.eval.artifacts import load_pair
    from ransacflow_tpu.models import init_resnet50_layer3
    from ransacflow_tpu.pipeline import init_alignment_params

    resnet_params = init_resnet50_layer3(jax.random.PRNGKey(0))
    align_params = init_alignment_params(jax.random.PRNGKey(1))

    h = w = 96
    img_dir = tmp_path / "scene"
    img_dir.mkdir()
    names = []
    for i in range(4):
        base = (rng.rand(h // 4, w // 4, 3) > 0.5).astype(np.float32)
        img = np.kron(base, np.ones((4, 4, 1), np.float32))[:h, :w]
        name = f"im{i}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(img_dir / name)
        names.append(name)
    (img_dir / "images.txt").write_text("\n".join(names) + "\n")
    pkl = tmp_path / "pairs.pkl"
    with open(pkl, "wb") as f:
        pickle.dump([[0, 1], [2, 3]], f)

    def run(n_devices, tag, batch_pairs=None):
        out = tmp_path / f"pred_{tag}"
        pooled_yfcc_predict(
            str(pkl), str(img_dir), str(out),
            resnet_params, align_params, n_devices,
            dict(nb_scale=1, n_iter=512, min_size=h),
            max_coarse=1, end_index=2, batch_pairs=batch_pairs,
        )
        return {i: load_pair(str(out), i) for i in range(2)}

    seq = run(1, "p1")
    pooled = run(2, "p2")
    batched = run(2, "b2", batch_pairs=2)
    for other in (pooled, batched):
        for idx in seq:
            assert (seq[idx] is None) == (other[idx] is None)
            if seq[idx] is None:
                continue
            assert set(seq[idx].keys()) == set(other[idx].keys())
            for k in seq[idx]:
                np.testing.assert_array_equal(seq[idx][k], other[idx][k])
