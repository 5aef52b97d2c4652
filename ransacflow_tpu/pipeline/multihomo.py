"""Multi-homography iteration: repeat coarse+fine on unmatched regions.

The shared skeleton of the reference's four eval harnesses
(evaluation/evalHpatch/evaluation.py:193-243): keep fitting homographies on
the not-yet-matched target region, refine each with the fine stage, accept
while the newly-matched area exceeds a threshold, and accumulate stacks of
(H, fine flow @ stride 8, matchability @ stride 8) for later compositing.
"""

import numpy as np
import jax.numpy as jnp

from ransacflow_tpu.ops.homography import warp_grid
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
