"""Fully-fused on-device alignment: one jitted program per pair geometry.

The host-orchestrated pipeline (coarse.py + fine.py) mirrors the reference's
staging and supports masks/multi-homography iteration. This module is the
serving/throughput path: multi-scale coarse features, mutual matching,
vectorized RANSAC, homography warp, and the full fine stage compiled into a
SINGLE XLA program — zero host round trips per pair. Batching over pairs is
a `lax.scan` around it (`fused_align_batch`).
"""

from functools import partial

import math

import jax
import jax.numpy as jnp

from ransacflow_tpu.models.resnet50 import resnet50_layer3, imagenet_preprocess
from ransacflow_tpu.models.layers import l2_normalize
from ransacflow_tpu.ops.grid import feature_cell_coords
from ransacflow_tpu.ops.matching import mutual_matching
from ransacflow_tpu.ops.ransac import (
    ransac_homography,
    ransac_homography_adaptive,
)
from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features


def device_pyramid(image, shapes):
    """Build the coarse scale pyramid ON DEVICE with Lanczos-3 resampling.

    The reference resizes each scale on the host with PIL LANCZOS
    (quick_start/coarseAlignFeatMatch.py:97); `jax.image.resize('lanczos3')`
    is the same kernel family, so matching quality is preserved while the
    host ships ONE image instead of seven.

    Args:
      image: (1, H, W, 3) the full-resolution source.
      shapes: static list of (Hi, Wi) pyramid shapes (see
        `ransacflow_tpu.utils.image.scale_list` + stride flooring).
    Returns tuple of (1, Hi, Wi, 3) images.
    """
    return tuple(
        image if (h, w) == tuple(image.shape[1:3])
        else jax.image.resize(image, (1, h, w, 3), method="lanczos3")
        for (h, w) in shapes
    )


def _bank_coords(pyramid_shapes, stride=16):
    """Static (nA, 2) (x, y) cell coords for a pyramid of image shapes."""
    xs, ys = [], []
    for (h, w) in pyramid_shapes:
        y, x = feature_cell_coords(h // stride, w // stride)
        xs.append(x)
        ys.append(y)
    return jnp.stack([jnp.concatenate(xs), jnp.concatenate(ys)], axis=1)


def _coarse_match(resnet_params, pyramid, target, stem_s2d=False,
                  anchor_stride=0, relax_cells=0):
    """Coarse features + mutual matching for one pair.

    Returns (m1, m2, valid): homogeneous match arrays keyed by target cell
    (fixed shape — padded/invalid rows masked by `valid`).

    stem_s2d runs the trunk's conv1 as the exact space-to-depth rewrite
    (models/resnet50.py `_stem_s2d`): wins trunk-only benches but loses
    inside this fused program (see the _stem_s2d docstring) — default off.

    anchor_stride (opt-in APPROXIMATION, 0 = reference-parity exact mode):
    run the trunk only at ANCHOR scales (every `anchor_stride`-th pyramid
    entry, index 0 first) and derive each remaining scale's feature map by
    bilinearly resampling its nearest anchor's pre-normalization features
    (re-L2-normalized per location). The exact mode pushes ~11x the base
    pixel count through ResNet-50 (sum of s^2 over the 7 linear scales
    2.0..0.5 — the serving path's dominant cost, docs/PERFORMANCE.md);
    stride 3 anchors {2.0, 1.0, 0.5} at ~5.25x, a ~2.1x trunk-FLOP cut,
    while capping the feature resampling ratio at ~1.33x. Resampling from
    a FAR scale does not work: an all-from-largest variant (resampling
    ratios up to 4x) collapsed mutual matching against the exactly-
    computed target features — 984 -> 149 matches on a same-content pair
    (the dead-end record in docs/PERFORMANCE.md); nearest-anchor with
    small stride retains 74-92% of the exact mode's matches across
    planted scale ratios 1.0-2.0 (tests/test_fused.py pins this).

    relax_cells (opt-in, companion to anchor_stride): accept a match when
    the back-match lands within this many target cells instead of exact
    index reciprocity (ops/matching.mutual_matching). Repairs the anchor
    mode's vote-splitting losses — resampled near-duplicate bank rows
    steal the argmax and shift the back-match by ~1 cell (measured
    mechanism + quality table in docs/PERFORMANCE.md). 0 = reference
    semantics; has no effect worth opting into without anchor_stride.
    """
    if anchor_stride:
        anchors = list(range(0, len(pyramid), int(anchor_stride)))
        f_anchor = {}
        for i in anchors:
            f, _ = resnet50_layer3(
                resnet_params, imagenet_preprocess(pyramid[i]),
                stem_s2d=stem_s2d)
            f_anchor[i] = f

        def log_scale(i):
            return 0.5 * math.log(
                float(pyramid[i].shape[1] * pyramid[i].shape[2]))

        feats = []
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
        feats = []
        for img in pyramid:
            f, _ = resnet50_layer3(resnet_params, imagenet_preprocess(img),
                                   stem_s2d=stem_s2d)
            feats.append(l2_normalize(f, axis=-1).reshape(-1, f.shape[-1]))
    bank = jnp.concatenate(feats, axis=0)  # (nA, 1024)
    coords_a = _bank_coords([img.shape[1:3] for img in pyramid])

    ft, _ = resnet50_layer3(resnet_params, imagenet_preprocess(target),
                            stem_s2d=stem_s2d)
    ft = l2_normalize(ft, axis=-1)
    fh, fw = ft.shape[1:3]
    featt = ft.reshape(-1, ft.shape[-1])  # (nB, 1024)
    y, x = feature_cell_coords(fh, fw)
    coords_b = jnp.stack([x, y], axis=1)

    m = mutual_matching(bank.T, featt.T, relax_cells=relax_cells,
                        grid_w=fw)
    n_b = coords_b.shape[0]
    ones = jnp.ones((n_b, 1), jnp.float32)
    m1 = jnp.concatenate([coords_a[m.src_idx], ones], axis=1)
    m2 = jnp.concatenate([coords_b, ones], axis=1)
    return m1, m2, m.valid


@partial(
    jax.jit,
    static_argnames=("n_iter", "kernel_size", "cycle_match", "stem_s2d",
                     "adaptive_chunk", "anchor_stride", "relax_cells"),
)
def fused_align(
    resnet_params,
    align_params,
    pyramid,
    target,
    key,
    tolerance=0.05,
    n_iter=10000,
    kernel_size=7,
    cycle_match=True,
    stem_s2d=False,
    adaptive_chunk=0,
    anchor_stride=0,
    relax_cells=0,
):
    """Align one pair entirely on device.

    Args:
      pyramid: tuple of (1, Hi, Wi, 3) source images at the coarse scales
        (the middle entry is the one warped by the fine stage).
      target: (1, Ht, Wt, 3) target image.
      key: PRNG key for RANSAC sampling.

    Returns dict: 'H21' (3,3), 'found' (), 'num_inliers' (), 'flow'
    (1,Ht,Wt,2), 'match' (Ht,Wt), 'flow_down8', 'match_down8'.
    """
    m1, m2, valid = _coarse_match(resnet_params, pyramid, target,
                                  stem_s2d=stem_s2d,
                                  anchor_stride=anchor_stride,
                                  relax_cells=relax_cells)
    res = _ransac(key, m1, m2, valid, tolerance, n_iter, adaptive_chunk)
    return _fine_with_gate(
        align_params, pyramid, target, res, cycle_match, kernel_size
    )


def _ransac(key, m1, m2, valid, tolerance, n_iter, adaptive_chunk):
    """Fixed-count RANSAC, or confidence-early-exit when adaptive_chunk > 0
    (ops/ransac.ransac_homography_adaptive; n_iter becomes the cap)."""
    if adaptive_chunk:
        res, _ = ransac_homography_adaptive(
            key, m1, m2, valid, tolerance, n_iter=n_iter,
            chunk=adaptive_chunk,
        )
        return res
    return ransac_homography(key, m1, m2, valid, tolerance, n_iter=n_iter)


def _fine_with_gate(align_params, pyramid, target, res, cycle_match,
                    kernel_size):
    # -- fine stage ---------------------------------------------------------
    # Gate on RANSAC failure (reference stops and returns None,
    # utils/outil.py:145-146): a garbage best-H21 must never leak into the
    # warp — substitute identity BEFORE warping (a degenerate H could emit
    # inf/NaN through the homogeneous divide), zero the matchability, and
    # return identity grids for the flows so callers that ignore `found`
    # still get well-formed no-op output.
    ht, wt = target.shape[1:3]
    eye = jnp.eye(3, dtype=res.H21.dtype)
    h_used = jnp.where(res.found, res.H21, eye)
    flow_coarse = warp_grid(h_used[None], ht, wt)
    src = pyramid[len(pyramid) // 2]
    featt_fine = fine_features(align_params, target)
    out = pred_flow_mask(
        align_params, src, featt_fine, flow_coarse,
        cycle_match=cycle_match, kernel_size=kernel_size,
    )
    foundf = res.found.astype(out["match"].dtype)
    id_grid = warp_grid(eye[None], ht, wt)
    return {
        "H21": h_used,
        "found": res.found,
        "num_inliers": res.num_inliers,
        # `flow` is an ABSOLUTE sampling grid -> identity grid is its no-op;
        # `flow_down8` is the RAW stride-8 residual that consumers compose
        # as clip(upsample(flow_down8) + grid) -> zeros is its no-op
        "flow": jnp.where(res.found, out["flow"], id_grid),
        "match": out["match"] * foundf,
        "flow_down8": out["flow_down8"] * foundf,
        "match_down8": out["match_down8"] * foundf,
    }


@partial(
    jax.jit,
    static_argnames=("n_iter", "kernel_size", "cycle_match", "batch_mode",
                     "stem_s2d", "adaptive_chunk", "anchor_stride",
                     "relax_cells"),
)
def fused_align_batch(
    resnet_params,
    align_params,
    pyramids,
    targets,
    keys,
    tolerance=0.05,
    n_iter=10000,
    kernel_size=7,
    cycle_match=True,
    batch_mode="scan",
    stem_s2d=False,
    adaptive_chunk=0,
    anchor_stride=0,
    relax_cells=0,
):
    """Run `fused_align` over a batch of pairs resident on device.

    Args:
      pyramids: tuple of (K, 1, Hi, Wi, 3) stacked scale images.
      targets: (K, 1, Ht, Wt, 3).
      keys: (K, 2) PRNG keys.
      batch_mode: 'scan' runs pairs sequentially (minimal memory), 'vmap'
        batches every stage including RANSAC scoring (loses at large n_iter:
        the (pairs x matches x hypotheses) intermediates become multi-GB),
        'hybrid' batches the conv/matching/fine stages across pairs on the
        MXU while streaming RANSAC scoring one pair at a time. After the
        round-2 gather optimizations 'scan' wins outright at the default
        10k iters (41.4 vs 23.5 pairs/s measured; the batched full-res
        fine stage is HBM-pressure-bound), so 'scan' is the default.
        'chunk<k>' scans over chunks of k pairs with the trunk+matching
        vmapped inside the chunk (conv batching on the MXU) while RANSAC
        and the fine stage stream pair-at-a-time; 'chunkf<k>' additionally
        vmaps the fine stage over the chunk (only RANSAC streams);
        'chunkv<k>' vmaps the whole chunk. All bound the live HBM set to
        k pairs instead of K.
    Returns dict of stacked outputs (leading axis K).
    """

    def one(pyr, tgt, k):
        return fused_align(
            resnet_params, align_params, tuple(pyr), tgt, k,
            tolerance, n_iter, kernel_size, cycle_match, stem_s2d,
            adaptive_chunk, anchor_stride, relax_cells,
        )

    if batch_mode == "vmap":
        return jax.vmap(one)(tuple(pyramids), targets, keys)

    if batch_mode == "hybrid":
        m1, m2, valid = jax.vmap(
            lambda pyr, tgt: _coarse_match(resnet_params, tuple(pyr), tgt,
                                           stem_s2d=stem_s2d,
                                           anchor_stride=anchor_stride,
                                           relax_cells=relax_cells)
        )(tuple(pyramids), targets)

        def r_body(_, inp):
            k, a, b, v = inp
            return None, _ransac(k, a, b, v, tolerance, n_iter,
                                 adaptive_chunk)

        _, res = jax.lax.scan(r_body, None, (keys, m1, m2, valid))

        return jax.vmap(
            lambda pyr, tgt, r: _fine_with_gate(
                align_params, tuple(pyr), tgt, r, cycle_match, kernel_size
            )
        )(tuple(pyramids), targets, res)

    if batch_mode.startswith("chunk"):
        spec = batch_mode[5:]
        full_vmap = spec.startswith("v")
        fine_vmap = spec.startswith("f")
        c = int(spec[1:] if (full_vmap or fine_vmap) else spec)
        n = targets.shape[0]
        if n % c:
            raise ValueError(
                f"batch_mode {batch_mode!r} needs the pair count ({n}) "
                f"divisible by the chunk size ({c})"
            )

        def chunked(x):
            return x.reshape((n // c, c) + x.shape[1:])

        pyr_c = tuple(chunked(p) for p in pyramids)
        tgt_c, keys_c = chunked(targets), chunked(keys)

        def chunk_body(_, inp):
            pyr, tgt, ks = inp
            if full_vmap:
                return None, jax.vmap(one)(tuple(pyr), tgt, ks)

            m1, m2, valid = jax.vmap(
                lambda py, t: _coarse_match(
                    resnet_params, tuple(py), t, stem_s2d=stem_s2d,
                    anchor_stride=anchor_stride, relax_cells=relax_cells
                )
            )(tuple(pyr), tgt)

            if fine_vmap:
                # 'chunkf<k>': the hybrid split inside one chunk — RANSAC
                # streams (its (matches x hypotheses) intermediates stay
                # single-pair) while the conv-heavy fine stage batches on
                # the MXU with its live set bounded to k pairs, not K
                def r_body(_, i2):
                    k, a, b, v = i2
                    return None, _ransac(k, a, b, v, tolerance, n_iter,
                                         adaptive_chunk)

                _, res = jax.lax.scan(r_body, None, (ks, m1, m2, valid))
                return None, jax.vmap(
                    lambda py, t, r: _fine_with_gate(
                        align_params, tuple(py), t, r, cycle_match,
                        kernel_size
                    )
                )(tuple(pyr), tgt, res)

            def rf_body(_, i2):
                k, a, b, v, py, t = i2
                res = _ransac(k, a, b, v, tolerance, n_iter,
                              adaptive_chunk)
                return None, _fine_with_gate(
                    align_params, tuple(py), t, res, cycle_match, kernel_size
                )

            _, outs = jax.lax.scan(
                rf_body, None, (ks, m1, m2, valid, tuple(pyr), tgt)
            )
            return None, outs

        _, outs = jax.lax.scan(chunk_body, None, (pyr_c, tgt_c, keys_c))
        return jax.tree.map(
            lambda x: x.reshape((n,) + x.shape[2:]), outs
        )

    if batch_mode != "scan":
        raise ValueError(f"unknown batch_mode: {batch_mode!r}")

    def body(_, inp):
        pyr, tgt, k = inp
        return None, one(pyr, tgt, k)

    _, outs = jax.lax.scan(body, None, (tuple(pyramids), targets, keys))
    return outs
