"""Diagnose the anchor-mode retention collapse (stride 2, ratio 2.0).

Hypothesis: resampled near-duplicate bank rows at neighboring pyramid
levels steal the target-side argmax from the true rows; the back-match
then lands on a *neighboring* target cell, breaking exact-index mutual
reciprocity even though the geometry is nearly identical (vote
splitting).  If true: (a) anchor-mode lost matches should show the
back-match within ~1 cell of the original target cell, and (b) a
relaxed reciprocity (accept when the back-match lands within eps cells)
should rescue most of the lost matches.

Findings (round 5, recorded in docs/PERFORMANCE.md): most anchor-mode
losses sit at back-match Chebyshev distance 1 and land on resampled
neighbor levels; relax_cells=1 rescues them (and admits a few extra
near-reciprocal matches beyond the exact set). This motivated the
`relax_cells` option on ops/matching.mutual_matching.

CPU, small shapes (~3 min on the 1-core host).
Run: python scripts/diag_anchor_votesplit.py
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ransacflow_tpu.models import init_resnet50_layer3
from ransacflow_tpu.models.resnet50 import resnet50_layer3, imagenet_preprocess
from ransacflow_tpu.models.layers import l2_normalize
from ransacflow_tpu.ops.matching import mutual_matching
from ransacflow_tpu.pipeline.fused import _bank_coords, device_pyramid
from bench import pyramid_shapes
import math

HT, WT = 128, 160
SHAPES = pyramid_shapes(min_size=HT, aspect=(HT, WT))
print("pyramid shapes:", SHAPES)

params = init_resnet50_layer3(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)

base = np.kron((rng.rand(HT // 4, WT // 4, 3) > 0.5).astype(np.float32),
               np.ones((4, 4, 1), np.float32))[:HT, :WT]
tgt = jnp.asarray(np.roll(base, (16, 16), (0, 1)))[None]


def bank_features(pyramid, anchor_stride):
    """Replicates _coarse_match's bank construction, returns per-level."""
    feats = []
    if anchor_stride:
        anchors = list(range(0, len(pyramid), anchor_stride))
        f_anchor = {}
        for i in anchors:
            f, _ = resnet50_layer3(params, imagenet_preprocess(pyramid[i]))
            f_anchor[i] = f

        def log_scale(i):
            return 0.5 * math.log(
                float(pyramid[i].shape[1] * pyramid[i].shape[2]))

        for j in range(len(pyramid)):
            i = min(anchors, key=lambda a: abs(log_scale(a) - log_scale(j)))
            f0 = f_anchor[i]
            c = f0.shape[-1]
            fh = pyramid[j].shape[1] // 16
            fw = pyramid[j].shape[2] // 16
            f = f0 if (fh, fw) == tuple(f0.shape[1:3]) else jax.image.resize(
                f0, (1, fh, fw, c), method="bilinear")
            feats.append(l2_normalize(f, axis=-1).reshape(-1, c))
    else:
        for img in pyramid:
            f, _ = resnet50_layer3(params, imagenet_preprocess(img))
            feats.append(l2_normalize(f, axis=-1).reshape(-1, f.shape[-1]))
    return feats


def level_of(idx, sizes):
    off = 0
    for lv, n in enumerate(sizes):
        if idx < off + n:
            return lv
        off += n
    return -1


ftgt, _ = resnet50_layer3(params, imagenet_preprocess(tgt))
ftgt = l2_normalize(ftgt, axis=-1)
fh, fw = ftgt.shape[1:3]
featt = ftgt.reshape(-1, ftgt.shape[-1])
cellsB = np.stack(np.meshgrid(np.arange(fw), np.arange(fh))[::-1],
                  axis=-1).reshape(-1, 2)  # (nB, 2) (row, col)

for ratio in (1.0, 4 / 3, 5 / 3, 2.0):
    sh = int(HT * ratio) // 16 * 16
    sw = int(WT * ratio) // 16 * 16
    core = np.asarray(jax.image.resize(jnp.asarray(base), (sh, sw, 3),
                                       "lanczos3"))
    src_h, src_w = SHAPES[0]
    src = np.zeros((src_h, src_w, 3), np.float32)
    src[:sh, :sw] = core[:src_h, :src_w]
    pyr = device_pyramid(jnp.asarray(src)[None], SHAPES)
    sizes = [(im.shape[1] // 16) * (im.shape[2] // 16) for im in pyr]

    feats_e = bank_features(pyr, 0)
    m_e = mutual_matching(jnp.concatenate(feats_e, 0).T, featt.T)
    ve = np.asarray(m_e.valid)

    for stride in (2, 3):
        feats_a = bank_features(pyr, stride)
        bank = jnp.concatenate(feats_a, 0)
        score = np.asarray(jnp.dot(bank, featt.T,
                                   preferred_element_type=jnp.float32))
        best_src = score.argmax(0)          # (nB,)
        best_tgt = score.argmax(1)          # (nA,)
        cols = np.arange(score.shape[1])
        mutual = best_tgt[best_src] == cols
        va = mutual & (score[best_src, cols] != 0)

        # where do the LOST matches' back-matches land?
        lost = ve & ~va
        back = best_tgt[best_src]           # (nB,) target cell of backmatch
        d = np.abs(cellsB[back] - cellsB[cols]).max(1)  # Chebyshev cells
        # relaxed reciprocity at various radii
        line = [f"stride {stride} ratio {ratio:.2f}: "
                f"exact {int(ve.sum()):4d} anchor {int(va.sum()):4d} "
                f"lost {int(lost.sum()):4d}"]
        for eps in (1, 2):
            relaxed = (d <= eps) & (score[best_src, cols] != 0)
            resc = int((lost & relaxed).sum())
            line.append(f"eps{eps}: rescued {resc} "
                        f"total {int(relaxed.sum())}")
        # back-match distance histogram of the lost set
        dl = d[lost]
        hist = {int(k): int((dl == k).sum()) for k in np.unique(dl)[:6]}
        line.append(f"lost back-dist hist {hist}")
        # level distribution of anchor-mode picks on the lost set
        lv = np.array([level_of(i, sizes) for i in best_src])
        lvh = {int(k): int(((lv == k) & lost).sum()) for k in range(7)}
        line.append(f"lost pick-level {lvh}")
        print("  ".join(line))
