"""Multi-homography iteration: repeat coarse+fine on unmatched regions.

The shared skeleton of the reference's four eval harnesses
(evaluation/evalHpatch/evaluation.py:193-243): keep fitting homographies on
the not-yet-matched target region, refine each with the fine stage, accept
while the newly-matched area exceeds a threshold, and accumulate stacks of
(H, fine flow @ stride 8, matchability @ stride 8) for later compositing.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.ops.ransac import (
    ransac_homography,
    ransac_homography_adaptive,
)
from ransacflow_tpu.pipeline.coarse import (
    _homogeneous_matches,
    _mask_to_cells,
    _match_masked,
)
from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features


def multi_homography_predict(
    coarse,
    params,
    max_coarse=10,
    mask_region_th=0.01,
    cycle_match=True,
    bg_mask=None,
    kernel_size=7,
):
    """Run the multi-homography loop for the pair already set on `coarse`.

    Args:
      coarse: a CoarseAligner with set_pair() done.
      params: alignment nets (netFeatCoarse / netFlowCoarse / netMatch).
      max_coarse: max number of homographies (reference default 10).
      mask_region_th: min fraction of newly-matched pixels to accept another
        homography (reference default 0.01, KITTI 0.005).
      cycle_match: PredFlowMask variant flag (see pipeline/fine.py).
      bg_mask: optional (Ht, Wt) float array, 1 = foreground usable, 0 =
        background/sky to exclude (the reference's It_bg).

    Returns None if no homography was found, else dict with numpy stacks:
      'coarse_h': (n, 3, 3), 'fine_flow_down8': (n, h8, w8, 2),
      'fine_match_down8': (n, h8, w8, 2), 'bg_mask': (Ht, Wt).
    """
    ht, wt = coarse.tgt_array.shape[:2]
    if bg_mask is None:
        bg_mask = np.ones((ht, wt), np.float32)
    src = jnp.asarray(coarse.src_array)[None]
    featt = fine_features(params, jnp.asarray(coarse.tgt_array)[None])

    mask = np.zeros((ht, wt), np.float32)
    hs, flows, matches = [], [], []

    nb_coarse = 0
    while nb_coarse <= max_coarse:
        fg_mask = ((mask + (1.0 - bg_mask)) > 0.5).astype(np.float32)
        H, _ = coarse.get_coarse(fg_mask)
        if H is None:
            break
        flow_coarse = warp_grid(jnp.asarray(H)[None], ht, wt)
        out = pred_flow_mask(
            params, src, featt, flow_coarse,
            cycle_match=cycle_match, kernel_size=kernel_size,
        )
        match_fine = np.asarray(out["match"])

        if (match_fine * (1.0 - fg_mask)).mean() > mask_region_th or nb_coarse == 0:
            hs.append(H)
            flows.append(np.asarray(out["flow_down8"][0]))
            matches.append(np.asarray(out["match_down8"][0]))
            nb_coarse += 1
            # the reference's `len == 0` guard is dead code (the append
            # happens first, evaluation/evalHpatch/evaluation.py:232-238),
            # so the accepted region is always re-masked by (1 - fgMask)
            match_fine = match_fine * (1.0 - fg_mask)
            mask = ((mask + match_fine) >= 1.0).astype(np.float32)
        else:
            break

    if not hs:
        return None
    return {
        "coarse_h": np.stack(hs),
        "fine_flow_down8": np.stack(flows),
        "fine_match_down8": np.stack(matches),
        "bg_mask": bg_mask.astype(bool),
    }


@partial(
    jax.jit,
    static_argnames=(
        "feat_h", "feat_w", "max_coarse", "cycle_match", "kernel_size",
        "n_iter", "n_points", "transform", "rematch", "adaptive_chunk",
        "relax_cells",
    ),
)
def _fused_multi_homo(
    params, bank, featt_c, coords_a, coords_b, cached_src, cached_valid,
    src, featt_fine, bg_mask, key, tolerance, mask_region_th,
    *, feat_h, feat_w, max_coarse, cycle_match, kernel_size, n_iter,
    n_points, transform, rematch, adaptive_chunk=0, relax_cells=0,
):
    """The whole multi-homography loop as ONE device program.

    The host loop above round-trips the (Ht, Wt) mask + match map and the
    found/valid scalars every iteration — up to ~20 blocking syncs per pair
    on the dev tunnel. Here the loop state (mask, accepted stacks, count)
    lives in a fixed-shape `lax.while_loop` carry; the host pulls one
    result at the end. No fp64 re-polish of the winning minimal sets (use
    the host loop for exact reference numerics).

    adaptive_chunk > 0 switches each RANSAC fit to the confidence-based
    early-exit mode (`ransac_homography_adaptive`, chunk size =
    adaptive_chunk, confidence 0.999): the per-homography hypothesis cost
    drops from n_iter to ~one chunk on well-matched regions while the
    hypothesis distribution is unchanged. 0 = fixed n_iter (parity
    default).
    """
    ht, wt = bg_mask.shape
    h8, w8 = featt_fine.shape[1:3]
    n_slots = max_coarse + 1

    def cond(st):
        return (~st["done"]) & (st["count"] < n_slots)

    def body(st):
        mask = st["mask"]
        fg = ((mask + (1.0 - bg_mask)) > 0.5).astype(jnp.float32)
        # shared policy helpers (pipeline/coarse.py) — same implementations
        # as the host loop and the rotation pre-test
        mask_cell = _mask_to_cells(fg, feat_h, feat_w)
        src_idx, valid = _match_masked(
            bank, featt_c, mask_cell, cached_src, cached_valid, rematch,
            relax_cells, feat_w,
        )
        m1, m2 = _homogeneous_matches(coords_a, coords_b, src_idx)
        key, sub = jax.random.split(st["key"])
        if adaptive_chunk:
            res, _ = ransac_homography_adaptive(
                sub, m1, m2, valid, tolerance, n_iter=n_iter,
                chunk=adaptive_chunk, n_points=n_points,
                transform=transform,
            )
        else:
            res = ransac_homography(
                sub, m1, m2, valid, tolerance, n_iter=n_iter,
                n_points=n_points, transform=transform,
            )
        h_used = jnp.where(res.found, res.H21,
                           jnp.eye(3, dtype=res.H21.dtype))
        flow_coarse = warp_grid(h_used[None], ht, wt)
        out = pred_flow_mask(
            params, src, featt_fine, flow_coarse,
            cycle_match=cycle_match, kernel_size=kernel_size,
        )
        newly = out["match"] * (1.0 - fg)  # (ht, wt)
        accept = res.found & (
            (jnp.mean(newly) > mask_region_th) | (st["count"] == 0)
        )
        c = st["count"]
        hs = st["hs"].at[c].set(jnp.where(accept, h_used, st["hs"][c]))
        flows = st["flows"].at[c].set(
            jnp.where(accept, out["flow_down8"][0], st["flows"][c])
        )
        matches = st["matches"].at[c].set(
            jnp.where(accept, out["match_down8"][0], st["matches"][c])
        )
        new_mask = jnp.where(
            accept, ((mask + newly) >= 1.0).astype(jnp.float32), mask
        )
        return {
            "mask": new_mask,
            "key": key,
            "hs": hs,
            "flows": flows,
            "matches": matches,
            "count": c + accept.astype(jnp.int32),
            "done": ~accept,
        }

    init = {
        "mask": jnp.zeros((ht, wt), jnp.float32),
        "key": key,
        "hs": jnp.zeros((n_slots, 3, 3), jnp.float32),
        "flows": jnp.zeros((n_slots, h8, w8, 2), jnp.float32),
        "matches": jnp.zeros((n_slots, h8, w8, 2), jnp.float32),
        "count": jnp.int32(0),
        "done": jnp.asarray(False),
    }
    return lax.while_loop(cond, body, init)


@partial(
    jax.jit,
    static_argnames=(
        "feat_h", "feat_w", "max_coarse", "cycle_match", "kernel_size",
        "n_iter", "n_points", "transform", "rematch", "adaptive_chunk",
        "relax_cells",
    ),
)
def _fused_multi_homo_batch(
    params, banks, featts_c, coords_a, coords_b, cached_srcs, cached_valids,
    srcs, featts_fine, bg_masks, keys, tolerance, mask_region_th,
    *, feat_h, feat_w, max_coarse, cycle_match, kernel_size, n_iter,
    n_points, transform, rematch, adaptive_chunk=0, relax_cells=0,
):
    """`_fused_multi_homo` over a stack of same-shape pairs in ONE program.

    Per-pair dispatch + count readback costs ~120 ms/pair of host/tunnel
    overhead (measured vs the ~12 ms/iteration device compute) — this scans
    the whole loop over the pair axis inside one jit so a batch needs one
    dispatch and one readback total. Pairs must share shapes (same pyramid
    config and target size); bucket real datasets by resized shape.
    coords_a/coords_b are shared (shape-derived), not stacked.
    """

    def body(_, inp):
        bank, featt_c, cs, cv, src, ff, bg, key = inp
        out = _fused_multi_homo(
            params, bank, featt_c, coords_a, coords_b, cs, cv,
            src, ff, bg, key, tolerance, mask_region_th,
            feat_h=feat_h, feat_w=feat_w, max_coarse=max_coarse,
            cycle_match=cycle_match, kernel_size=kernel_size,
            n_iter=n_iter, n_points=n_points, transform=transform,
            rematch=rematch, adaptive_chunk=adaptive_chunk,
            relax_cells=relax_cells,
        )
        # the full-res mask is loop state, not a result; don't stack it
        out.pop("mask")
        return None, out

    _, outs = lax.scan(
        body, None,
        (banks, featts_c, cached_srcs, cached_valids, srcs, featts_fine,
         bg_masks, keys),
    )
    return outs


def multi_homography_dispatch(
    coarse,
    params,
    max_coarse=10,
    mask_region_th=0.01,
    cycle_match=True,
    bg_mask=None,
    kernel_size=7,
    key=None,
):
    """Dispatch the device-resident loop WITHOUT syncing; returns
    (final_device_dict, bg) for `multi_homography_finalize`. Splitting
    dispatch from finalize lets a caller pipeline many pairs (or many
    devices — see eval/pooled.py) before blocking on any result.

    key: explicit PRNG key for the loop's RANSAC draws; None advances the
    aligner's stream (order-dependent). Pair-indexed keys
    (jax.random.fold_in) make artifacts independent of dispatch order.
    """
    ht, wt = coarse.tgt_array.shape[:2]
    bg = (np.ones((ht, wt), np.float32) if bg_mask is None
          else np.asarray(bg_mask, np.float32))
    src = jnp.asarray(coarse.src_array)[None]
    featt_fine = fine_features(params, jnp.asarray(coarse.tgt_array)[None])
    if key is None:
        coarse._key, key = jax.random.split(coarse._key)
    final = _fused_multi_homo(
        params, coarse._bank, coarse._featt, coarse._coordsA,
        coarse._coordsB, coarse._cached_src, coarse._cached_valid,
        src, featt_fine, jnp.asarray(bg), key,
        coarse.tolerance, mask_region_th,
        feat_h=coarse.feat_h, feat_w=coarse.feat_w, max_coarse=max_coarse,
        cycle_match=cycle_match, kernel_size=kernel_size,
        n_iter=coarse.n_iter, n_points=coarse.n_points,
        transform=coarse.transform, rematch=coarse.rematch,
        adaptive_chunk=coarse.adaptive_chunk,
        relax_cells=coarse.relax_cells,
    )
    return final, bg


def multi_homography_finalize(final, bg):
    """Block on a dispatched loop and convert to the host artifact dict
    (None when no homography was accepted)."""
    n = int(final["count"])
    if n == 0:
        return None
    return {
        "coarse_h": np.asarray(final["hs"][:n], np.float32),
        "fine_flow_down8": np.asarray(final["flows"][:n]),
        "fine_match_down8": np.asarray(final["matches"][:n]),
        "bg_mask": bg.astype(bool),
    }


def multi_homography_predict_fused(
    coarse,
    params,
    max_coarse=10,
    mask_region_th=0.01,
    cycle_match=True,
    bg_mask=None,
    kernel_size=7,
    key=None,
):
    """Throughput variant of `multi_homography_predict`: same contract and
    acceptance logic, but the whole loop runs on device (one host sync per
    pair instead of ~4 per homography). Differences from the host loop:
    no fp64 re-polish of the winning hypotheses (device fp32 DLT is used
    directly), and the PRNG fold sequence differs, so individual RANSAC
    draws — though not the fitted geometry — can differ.
    """
    final, bg = multi_homography_dispatch(
        coarse, params, max_coarse=max_coarse,
        mask_region_th=mask_region_th, cycle_match=cycle_match,
        bg_mask=bg_mask, kernel_size=kernel_size, key=key,
    )
    return multi_homography_finalize(final, bg)
