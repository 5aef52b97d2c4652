"""Statistical RANSAC parity against the reference's executing sampler.

SURVEY.md §7 plans stochastic-parity in two halves: (a) exact-injection
parity (tests/test_reference_harness.py pins solve/score/select bit-level
with shared minimal sets) and (b) STATISTICAL parity — the two frameworks'
different PRNG streams (torch.randint vs JAX threefry) must induce the
same metric distribution. This module is half (b):

Both frameworks run their real stochastic coarse RANSAC — no injection —
on the same synthetic translation pair, over N_TRIALS seeds each, and the
per-trial coarse AEPE distributions are compared. The dataset deliberately
KEEPS the border cells (no exclusion mask): with untrained conv features,
zero-padding makes border cells vote for the identity transform
(tests/test_pipeline.py docstring), so the match set contains a genuine
competing model and RANSAC's per-seed outcome actually varies — at
moderate n_iter the hypothesis lottery matters, which is exactly the
regime where a sampling-distribution mismatch between the frameworks
would show up.

Reference side: utils/outil.py RANSAC (torch.randint sampling, duplicate
rejection, chunked scoring) executed from /root/reference under
torch.manual_seed(trial). Our side: ops/ransac.py via CoarseAligner with
reseed(trial).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ref_modules import load_reference_modules, reference_available
from test_eval import _write_hpatches_dataset, H_IMG, W_IMG, DX_PX, DY_PX
from test_models import TorchResNet50Trunk, _randomize_bn_stats
from test_reference_harness import _TorchCoarseMirror

from ransacflow_tpu.models import load_resnet50_trunk
from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.utils.image import scale_list

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not reference_available(), reason="reference tree not mounted"
    ),
]

N_TRIALS = 20
N_ITER = 64  # small enough that the hypothesis lottery has real variance
MIN_SIZE = H_IMG
NB_SCALE = 3
SCALE_R = 1.2


def _coarse_aepe_px(h21, h_gt, size=H_IMG):
    """Masked AEPE (px) of the coarse grid induced by h21 vs the GT grid —
    the getResults.py:224-248 formula applied to a single homography."""
    xs = np.linspace(-1.0, 1.0, size)
    gx, gy = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), gy.ravel(), np.ones(size * size)], axis=1)

    def warp(h):
        out = pts @ np.asarray(h, np.float64).T
        return out[:, :2] / out[:, 2:3]

    est, gt = warp(h21), warp(h_gt)
    mask = (np.abs(gt) <= 1.0).all(axis=1)
    d = np.linalg.norm((est - gt)[mask], axis=1) * (size - 1) / 2.0
    return float(d.mean())


def test_stochastic_ransac_aepe_distributions_match(tmp_path):
    ref = load_reference_modules()
    outil = ref["outil"]
    rng = np.random.RandomState(0)

    trunk = TorchResNet50Trunk().eval()
    with torch.no_grad():
        _randomize_bn_stats(trunk, rng)
    resnet_params = load_resnet50_trunk(trunk.state_dict())

    csv_dir, image_dir = _write_hpatches_dataset(tmp_path, rng)
    import os
    from PIL import Image

    i_s = Image.open(os.path.join(image_dir, "obj1", "1.ppm")).convert("RGB")
    i_t = Image.open(os.path.join(image_dir, "obj1", "2.ppm")).convert("RGB")

    tx, ty = 2 * DX_PX / W_IMG, 2 * DY_PX / H_IMG
    h_gt = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)

    # --- reference side: cached mutual matches, then outil.RANSAC per seed
    scales = scale_list(NB_SCALE, SCALE_R)
    mirror = _TorchCoarseMirror(trunk, outil, MIN_SIZE, scales)
    mirror.set_pair(i_s, i_t)
    ones = torch.ones(mirror.H1m.numel())
    match1 = torch.stack([mirror.H1m, mirror.W1m, ones], dim=1)
    match2 = torch.stack([mirror.H2m, mirror.W2m, ones], dim=1)

    ref_aepe = []
    for t in range(N_TRIALS):
        torch.manual_seed(t)
        best, _, _, _ = outil.RANSAC(
            N_ITER, match1, match2, 0.05, 4, outil.Homography
        )
        assert best is not None
        ref_aepe.append(_coarse_aepe_px(best, h_gt))

    # --- our side: the real CoarseAligner, reseeded per trial
    aligner = CoarseAligner(
        resnet_params, nb_scale=NB_SCALE, min_size=MIN_SIZE,
        scale_r=SCALE_R, n_iter=N_ITER, tolerance=0.05, resize_mode="min",
    )
    aligner.set_pair(i_s, i_t)
    my_aepe = []
    for t in range(N_TRIALS):
        aligner.reseed(t)
        h21, _ = aligner.get_coarse(None)
        assert h21 is not None
        my_aepe.append(_coarse_aepe_px(h21, h_gt))

    ref_aepe = np.asarray(ref_aepe)
    my_aepe = np.asarray(my_aepe)

    # sanity: with exact matches present, both sides mostly recover the
    # planted translation (medians small), and neither degenerates
    assert np.median(ref_aepe) < 8.0, ref_aepe
    assert np.median(my_aepe) < 8.0, my_aepe

    # distribution agreement: means within noise (Welch-style bound on the
    # fixed deterministic seed sets, plus a floor for tiny variances)
    se = np.sqrt(
        ref_aepe.var(ddof=1) / N_TRIALS + my_aepe.var(ddof=1) / N_TRIALS
    )
    diff = abs(ref_aepe.mean() - my_aepe.mean())
    assert diff <= 2.5 * se + 0.5, (
        ref_aepe.mean(), my_aepe.mean(), se, ref_aepe, my_aepe
    )
