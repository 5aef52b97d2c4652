"""Public two-image alignment API (the reference's quick_start surface).

``RansacFlowAligner.align_images(img1, img2)`` mirrors
quick_start/align2images.py:30-118: coarse homography via multi-scale
matching + RANSAC, then one fine flow pass, returning the homography, the
composed dense flow, matchability, and the warped source images.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ransacflow_tpu.models import (
    init_feature_extractor,
    init_net_flow_coarse,
    init_net_matchability,
    init_resnet50_layer3,
    load_alignment_checkpoint,
    load_resnet50_trunk,
)
from ransacflow_tpu.ops.homography import warp_grid
from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.pipeline.fine import pred_flow_mask, fine_features
from ransacflow_tpu.ops.sampler import grid_sample


def init_alignment_params(key=None, kernel_size=7):
    """Random-init the four alignment nets (for training from scratch)."""
    key = jax.random.PRNGKey(0) if key is None else key
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "netFeatCoarse": init_feature_extractor(k1),
        "netFlowCoarse": init_net_flow_coarse(k2, kernel_size),
        "netMatch": init_net_matchability(k3, kernel_size),
    }


class RansacFlowAligner:
    """End-to-end two-stage aligner.

    Args:
      align_params: fine-stage nets (from `init_alignment_params` or
        `load_alignment_checkpoint`).
      resnet_params: coarse ResNet-50 trunk params (from
        `init_resnet50_layer3` or `load_resnet50_trunk`).
      kernel_size: correlation neighborhood (default 7).
      coarse_kwargs: forwarded to CoarseAligner (nb_scale, n_iter,
        tolerance, min_size, scale_r, ...). Defaults mirror the
        quick_start demo: 7 scales, 10k iters, tol 0.05, minSize 400,
        scaleR 1.2, max-dim resize, per-call re-matching.
    """

    def __init__(self, align_params, resnet_params, kernel_size=7,
                 **coarse_kwargs):
        defaults = dict(
            nb_scale=7,
            n_iter=10000,
            tolerance=0.05,
            transform="homography",
            min_size=400,
            scale_r=1.2,
            resize_mode="max",
            rematch_per_call=True,
        )
        defaults.update(coarse_kwargs)
        self.params = align_params
        self.kernel_size = kernel_size
        self.coarse = CoarseAligner(resnet_params, **defaults)

    @classmethod
    def from_checkpoints(cls, align_pth, resnet_source, moco=False, **kw):
        """Build from the reference's released .pth files."""
        return cls(
            load_alignment_checkpoint(align_pth),
            load_resnet50_trunk(resnet_source, moco=moco),
            **kw,
        )

    def align_images(self, img1, img2, cycle_match=False, exclusion_mask=None):
        """Align source `img1` onto target `img2` (both PIL images).

        Args:
          exclusion_mask: optional (Ht, Wt) array over the *resized* target,
            1 = exclude from coarse matching (e.g. a sky mask).

        Returns dict:
          'H21': (3, 3) coarse homography (target -> source, normalized) or
            None when no model was found;
          'flow': (Ht, Wt, 2) composed fine sampling grid;
          'match': (Ht, Wt) matchability;
          'warped_coarse', 'warped_fine': (Ht, Wt, 3) warped source;
          'target': (Ht, Wt, 3) the resized target.
        """
        self.coarse.set_pair(img1, img2)
        H, _inlier = self.coarse.get_coarse(exclusion_mask)
        if H is None:
            return {"H21": None}
        ht, wt = self.coarse.tgt_array.shape[:2]
        src = jnp.asarray(self.coarse.src_array)[None]
        flow_coarse = warp_grid(jnp.asarray(H)[None], ht, wt)
        featt = fine_features(self.params, jnp.asarray(self.coarse.tgt_array)[None])
        out = pred_flow_mask(
            self.params, src, featt, flow_coarse,
            cycle_match=cycle_match, kernel_size=self.kernel_size,
        )
        warped_coarse = grid_sample(src, flow_coarse)
        warped_fine = grid_sample(src, out["flow"])
        return {
            "H21": H,
            "flow": np.asarray(out["flow"][0]),
            "match": np.asarray(out["match"]),
            "warped_coarse": np.asarray(warped_coarse[0]),
            "warped_fine": np.asarray(warped_fine[0]),
            "target": self.coarse.tgt_array,
        }
