"""Native C++ resampler: build, PIL parity, threading consistency."""

import numpy as np
import pytest
from PIL import Image

from ransacflow_tpu.native import lanczos_resize, native_available


def _pil_resize_f32(img, out_h, out_w):
    return np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, i], mode="F").resize(
                    (out_w, out_h), resample=Image.LANCZOS
                )
            )
            for i in range(img.shape[2])
        ],
        axis=-1,
    )


def test_native_builds():
    assert native_available(), "g++ toolchain should be present in this image"


@pytest.mark.parametrize("shape", [(64, 80, 3), (100, 60, 3), (37, 53, 1)])
@pytest.mark.parametrize("out", [(32, 48), (128, 96), (37, 53)])
def test_lanczos_matches_pil(rng, shape, out):
    img = rng.rand(*shape).astype(np.float32)
    ours = lanczos_resize(img, *out)
    gold = _pil_resize_f32(img, *out)
    assert ours.shape == (*out, shape[2])
    np.testing.assert_allclose(ours, gold, atol=2e-3)


def test_threading_deterministic(rng):
    img = rng.rand(200, 300, 3).astype(np.float32)
    a = lanczos_resize(img, 77, 111, n_threads=1)
    b = lanczos_resize(img, 77, 111, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_uint8_roundtrip_close_to_pil(rng):
    """End-to-end: uint8 image resized natively ~ PIL uint8 LANCZOS."""
    arr = (rng.rand(90, 120, 3) * 255).astype(np.uint8)
    pil = np.asarray(
        Image.fromarray(arr).resize((60, 45), resample=Image.LANCZOS),
        dtype=np.float32,
    )
    ours = lanczos_resize(arr.astype(np.float32), 45, 60)
    # PIL's uint8 path rounds AND clips the negative Lanczos lobes to
    # [0, 255] after each pass, so hard edges ring differently than the
    # float path; bulk agreement is what matters.
    diff = np.abs(ours - pil)
    assert np.percentile(diff, 99) < 2.0
    assert diff.mean() < 0.5


def test_pair_folder_native_path(rng, tmp_path):
    from ransacflow_tpu.train import PairFolder

    for idx in range(2):
        for v in (1, 2):
            arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"{idx}_{v}.jpg")
    folder = PairFolder(str(tmp_path), img_size=32, seed=0, use_native=True)
    batch = next(iter(folder.epoch_batches(batch_size=2)))
    assert batch["I1"].shape == (2, 32, 32, 3)
    assert batch["I1"].dtype == np.float32
    assert 0.0 <= batch["I1"].min() - 1e-3 and batch["I1"].max() <= 1.0 + 1e-3
