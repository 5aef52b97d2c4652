"""MegaDepth validation + model-selection subsystem tests (round-2 verdict
item #3: train/validation.py and fit()'s validation-gated branch were
implemented but untested).

Determinism trick: zeroing netFlowCoarse.conv4 makes the softmax over the
49 offset channels exactly uniform, whose expectation over the symmetric
offset grid is exactly zero residual flow — so the predicted correspondence
is exactly the frozen coarse affine, and every per-correspondence pixel
error equals the offset we plant in the GT CSV. Precision at each of the 8
thresholds is then an exact rational number.
"""

import os
import pickle

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from PIL import Image

from ransacflow_tpu.pipeline import init_alignment_params
from ransacflow_tpu.train.validation import (
    PIXEL_GRID,
    alignment_error,
    resize_min_resolution,
    validate,
)
from ransacflow_tpu.train.loop import fit, resume_params
from ransacflow_tpu.train.checkpoint import save_checkpoint, load_checkpoint

MIN_SIZE = 64
# planted pixel offsets along x; the expected precision is computed by the
# planter itself under the reference's int()-truncated accounting, with a
# margin assertion keeping every resulting error clear of every threshold
DELTAS = np.array([0.5, 2.5, 4.0, 6.0, 10.0, 20.0, 30.0, 100.0])


def _zero_flow_params(key=0, kernel_size=7):
    """Alignment params whose fine residual flow is exactly zero."""
    params = init_alignment_params(jax.random.PRNGKey(key), kernel_size)
    conv4 = params["netFlowCoarse"]["conv4"]["weight"]
    params["netFlowCoarse"]["conv4"]["weight"] = jnp.zeros_like(conv4)
    return params


def _affine_source_px(theta, xb, yb, wt, ht, ws, hs):
    """Expected source pixel of target pixel (xb, yb) under the affine."""
    xn = 2.0 * xb / (wt - 1) - 1.0
    yn = 2.0 * yb / (ht - 1) - 1.0
    sx_n = theta[0, 0] * xn + theta[0, 1] * yn + theta[0, 2]
    sy_n = theta[1, 0] * xn + theta[1, 1] * yn + theta[1, 2]
    return (sx_n + 1) * 0.5 * (ws - 1), (sy_n + 1) * 0.5 * (hs - 1)


def _write_val_dataset(tmp_path, rng):
    """Two CSV rows in one scene; row 1 plants DELTAS, row 2 plants all-0.2
    px offsets. Image min sides equal MIN_SIZE (and stride-16 multiples) so
    the resize is an exact no-op and coordinates stay unscaled."""
    import pandas as pd

    scene = tmp_path / "val" / "10"
    os.makedirs(scene)
    src = (rng.rand(MIN_SIZE, 96, 3) * 255).astype(np.uint8)  # (hs=64, ws=96)
    tgt = (rng.rand(80, MIN_SIZE, 3) * 255).astype(np.uint8)  # (ht=80, wt=64)
    Image.fromarray(src).save(scene / "s.jpg")
    Image.fromarray(tgt).save(scene / "t.jpg")
    hs, ws = src.shape[:2]
    ht, wt = tgt.shape[:2]

    thetas = [
        np.array([[0.8, 0.0, 0.1], [0.0, 0.9, -0.05]], np.float32),
        np.array([[1.0, 0.05, -0.1], [0.02, 0.85, 0.0]], np.float32),
    ]
    rows = []
    hits = np.zeros(8)
    total = 0
    for r, (theta, deltas) in enumerate(
        zip(thetas, [DELTAS, np.full(8, 0.2)])
    ):
        xb = np.linspace(8, wt - 9, 8).round()
        yb = np.linspace(8, ht - 9, 8).round()
        sx, sy = _affine_source_px(theta, xb, yb, wt, ht, ws, hs)
        xa = sx + deltas  # plant the error along x
        ya = sy
        # expected accounting under the reference's int() truncation of
        # the GT coords (train/validation.py:42-44)
        err = np.sqrt(
            (sx - xa.astype(int)) ** 2 + (sy - ya.astype(int)) ** 2
        )
        # every planted error must sit clear of every threshold: the fp32
        # flow path reproduces `err` only to ~1e-4
        assert np.abs(err.reshape(-1, 1)
                      - PIXEL_GRID.reshape(1, -1)).min() > 0.05
        hits += (err.reshape(-1, 1) < PIXEL_GRID.reshape(1, -1)).sum(0)
        total += len(err)
        rows.append({
            "scene": "10",
            "source_image": "s.jpg",
            "target_image": "t.jpg",
            "XA": ";".join(f"{v:.6f}" for v in xa),
            "YA": ";".join(f"{v:.6f}" for v in ya),
            "XB": ";".join(f"{v:.0f}" for v in xb),
            "YB": ";".join(f"{v:.0f}" for v in yb),
        })
    csv_path = tmp_path / "val.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    pkl_path = tmp_path / "coarse.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(thetas, f)
    return str(csv_path), str(tmp_path / "val"), str(pkl_path), hits / total


def test_pixel_grid_matches_reference():
    # train/validation.py:61-63: np.around(np.logspace(0, log10(36), 8))
    np.testing.assert_array_equal(PIXEL_GRID, [1, 2, 3, 5, 8, 13, 22, 36])


def test_resize_min_resolution_scales_coords():
    img = Image.new("RGB", (200, 100))
    x = np.array([0.0, 100.0, 199.0])
    y = np.array([0.0, 50.0, 99.0])
    out, xs, ys = resize_min_resolution(80, img, x, y)
    # ratio = 100/80 = 1.25 -> (160, 80), both stride-16 multiples already
    assert out.size == (160, 80)
    np.testing.assert_allclose(xs, x * 160 / 200)
    np.testing.assert_allclose(ys, y * 80 / 100)


def test_alignment_error_exact():
    flow = np.zeros((4, 6, 2), np.float32)
    flow[2, 3] = [0.5, -0.5]  # source px = (0.75*(ws-1), 0.25*(hs-1))
    ws, hs = 11, 9
    err = alignment_error(
        flow, np.array([7.5]), np.array([2.0]),
        np.array([3.0]), np.array([2.0]), ws, hs,
    )
    # the GT coords are int()-truncated like the reference's
    # (train/validation.py:42-44): predicted sx=7.5 vs int(7.5)=7 -> 0.5
    np.testing.assert_allclose(err, [0.5], atol=1e-6)

    # integer GT coords at the exact prediction -> zero error
    err = alignment_error(
        flow, np.array([7.0]), np.array([2.0]),
        np.array([3.0]), np.array([2.0]), ws, hs,
    )
    # sx=7.5 vs 7 -> 0.5 on x; sy=2.0 vs 2 -> 0
    np.testing.assert_allclose(err, [0.5], atol=1e-6)


def test_validate_exact_precision(tmp_path, rng):
    csv_path, val_dir, pkl_path, expected_prec = _write_val_dataset(
        tmp_path, rng)
    import pandas as pd

    df = pd.read_csv(csv_path, dtype=str)
    with open(pkl_path, "rb") as f:
        thetas = pickle.load(f)
    prec = validate(df, val_dir, thetas, _zero_flow_params(),
                    min_size=MIN_SIZE)
    np.testing.assert_allclose(prec, expected_prec, atol=1e-9)
    assert prec[4] == expected_prec[4]  # the model-selection metric


def _write_train_dir(tmp_path, rng):
    data = tmp_path / "train"
    os.makedirs(data)
    for idx in range(2):
        for v in (1, 2):
            arr = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(data / f"{idx}_{v}.jpg")
    return str(data)


def test_fit_preserves_caller_params(tmp_path, rng):
    """fit()'s single-device step donates param buffers in place
    (donate_argnums, train/loop.py); the entry copy must keep the CALLER's
    tree readable and unchanged after fit returns. Regression: the round-5
    full-gate run hit 'Buffer has been deleted or donated' when a second
    test read a shared fixture's params after another test passed them
    through fit."""
    train_dir = _write_train_dir(tmp_path, rng)
    params = init_alignment_params(jax.random.PRNGKey(0))
    # real copies, NOT np.asarray: a zero-copy numpy view pins the jax
    # buffer, which silently disables donation and hides the bug
    before = jax.tree_util.tree_map(lambda x: np.array(x, copy=True),
                                    params)
    fit(params, train_dir, str(tmp_path / "run"), epochs=1, batch_size=2,
        img_size=32, margin=8, max_steps_per_epoch=1)
    after = jax.tree_util.tree_map(np.asarray, params)  # must not raise
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_fit_best_model_gating(tmp_path, rng, monkeypatch):
    """Gating semantics (train/loop.py:152-172 vs reference
    train/train.py:269-313): save on improvement only, rename with the best
    score at the end, return the best precision."""
    import ransacflow_tpu.train.loop as loop_mod

    csv_path, val_dir, pkl_path, _ = _write_val_dataset(tmp_path, rng)
    train_dir = _write_train_dir(tmp_path, rng)
    out_dir = str(tmp_path / "run")

    seq = iter([0.5, 0.8, 0.3])
    calls = []

    def fake_validate(df, vdir, transforms, params, kernel_size=7,
                      min_size=480):
        calls.append(len(df))
        p = np.zeros(8)
        p[4] = next(seq)
        return p

    monkeypatch.setattr(loop_mod, "validate", fake_validate)
    params = init_alignment_params(jax.random.PRNGKey(0))
    _, best = fit(
        params, train_dir, out_dir, epochs=3, batch_size=2, img_size=32,
        margin=8, max_steps_per_epoch=1, val_csv=csv_path, val_dir=val_dir,
        val_coarse_pkl=pkl_path, val_min_size=MIN_SIZE,
    )
    assert best == 0.8 and calls == [2, 2, 2]
    assert not os.path.exists(os.path.join(out_dir, "BestModel"))
    final = os.path.join(out_dir, "BestModel@8_0.800")
    assert os.path.exists(final)
    # the kept checkpoint is the epoch-1 one (the last improvement)
    assert int(load_checkpoint(final)["step"]) == 1
    # no periodic checkpoints in validation mode
    assert not any(
        p.startswith("checkpoint_epoch") for p in os.listdir(out_dir)
    )


def test_fit_validation_integration(tmp_path, rng):
    """Real validate() inside fit(): with lr=0 the zero-flow params never
    change, so the validation precision is the exact planted value and the
    rename carries it."""
    csv_path, val_dir, pkl_path, expected_prec = _write_val_dataset(
        tmp_path, rng)
    train_dir = _write_train_dir(tmp_path, rng)
    out_dir = str(tmp_path / "run")

    params = _zero_flow_params()
    _, best = fit(
        params, train_dir, out_dir, epochs=1, batch_size=2, img_size=32,
        margin=8, lr=0.0, max_steps_per_epoch=1, val_csv=csv_path,
        val_dir=val_dir, val_coarse_pkl=pkl_path, val_min_size=MIN_SIZE,
    )
    assert best == pytest.approx(expected_prec[4], abs=1e-9)
    assert os.path.exists(
        os.path.join(out_dir, f"BestModel@8_{best:.3f}")
    )


def test_resume_params_orbax_and_mismatch(tmp_path):
    params = init_alignment_params(jax.random.PRNGKey(0))
    other = init_alignment_params(jax.random.PRNGKey(1))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, other)
    resumed = resume_params(ckpt, params)
    for key in ("netFeatCoarse", "netFlowCoarse", "netMatch"):
        np.testing.assert_array_equal(
            np.asarray(resumed[key]["conv1"]["weight"]),
            np.asarray(other[key]["conv1"]["weight"]),
        )

    # shape mismatch in one module (kernel 5 heads): that module keeps the
    # init weights, the compatible module is still taken (reference
    # per-module try/except, train/train.py:140-149)
    mixed = init_alignment_params(jax.random.PRNGKey(2), kernel_size=5)
    mixed["netFeatCoarse"] = other["netFeatCoarse"]
    ckpt2 = str(tmp_path / "ckpt2")
    save_checkpoint(ckpt2, mixed)
    resumed2 = resume_params(ckpt2, params)
    np.testing.assert_array_equal(
        np.asarray(resumed2["netFeatCoarse"]["conv1"]["weight"]),
        np.asarray(other["netFeatCoarse"]["conv1"]["weight"]),
    )
    np.testing.assert_array_equal(
        np.asarray(resumed2["netFlowCoarse"]["conv1"]["weight"]),
        np.asarray(params["netFlowCoarse"]["conv1"]["weight"]),
    )


def test_resume_params_pth(tmp_path, rng):
    from test_models import TorchFeatureExtractor, TorchHead
    from ransacflow_tpu.models import state_dict_to_tree

    feat = TorchFeatureExtractor().eval()
    flow = TorchHead(49, 49).eval()
    match = TorchHead(49, 1).eval()
    path = str(tmp_path / "ref.pth")
    torch.save(
        {
            "netFeatCoarse": feat.state_dict(),
            "netCorr": {},
            "netFlowCoarse": flow.state_dict(),
            "netMatch": match.state_dict(),
        },
        path,
    )
    params = init_alignment_params(jax.random.PRNGKey(0))
    resumed = resume_params(path, params)
    np.testing.assert_array_equal(
        np.asarray(resumed["netFlowCoarse"]["conv4"]["weight"]),
        np.asarray(state_dict_to_tree(flow.state_dict())["conv4"]["weight"]),
    )
