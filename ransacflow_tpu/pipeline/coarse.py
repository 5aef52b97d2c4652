"""Coarse alignment: multi-scale features -> mutual matching -> RANSAC.

ONE parameterized implementation replacing the reference's five copies of
``coarseAlignFeatMatch.py`` (SURVEY.md §1): the eval variant (matches cached
once per pair, filtered per mask) and the quick-start/YFCC variant
(re-matching against masked target features each call) are flags here.

Host/device split: PIL resize on host; per-scale feature extraction,
matching, and the entire RANSAC search are jitted device programs. The
single winning hypothesis is optionally re-solved on host in fp64
(`polish_fp64`), matching the reference's numpy-SVD numerics exactly.
"""

from functools import partial

import math

import numpy as np
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
from ransacflow_tpu.ops.homography import dlt_homography_np
from ransacflow_tpu.ops.sampler import interpolate_bilinear
from ransacflow_tpu.utils.image import (
    resize_min_size,
    resize_max_size,
    to_array,
    scale_list,
    STRIDE_NET,
)


@partial(jax.jit, static_argnames=("stem_s2d",))
def _coarse_feats(params, img, stem_s2d=False):
    """img (1, H, W, 3) in [0,1] -> L2-normalized (H/16 * W/16, 1024).

    stem_s2d: exact space-to-depth conv1 rewrite (models/resnet50.py
    `_stem_s2d`) — opt-in (wins trunk-only benches, loses in the fused
    serving program); off = bit-level torch parity.
    """
    feat, _ = resnet50_layer3(params, imagenet_preprocess(img),
                              stem_s2d=stem_s2d)
    feat = l2_normalize(feat, axis=-1)  # per spatial location, channel dim
    _, fh, fw, c = feat.shape
    return feat.reshape(fh * fw, c)


@partial(jax.jit, static_argnames=("stem_s2d",))
def _coarse_feat_map(params, img, stem_s2d=False):
    """img (1, H, W, 3) in [0,1] -> PRE-normalization (1, fh, fw, 1024) map.

    The anchor-stride mode resamples this map to neighbor pyramid scales
    before the per-location L2 normalization (normalizing after the
    bilinear blend keeps every bank row unit-norm — the cosine-matching
    contract `mutual_matching` assumes)."""
    feat, _ = resnet50_layer3(params, imagenet_preprocess(img),
                              stem_s2d=stem_s2d)
    return feat


@partial(jax.jit, static_argnames=("fh", "fw"))
def _anchor_resample_feats(fmap, fh, fw):
    """Nearest-anchor pre-norm map -> this scale's L2-normalized bank rows.

    Identity (no resize) when the anchor's grid already matches, so anchor
    scales themselves reproduce `_coarse_feats` exactly."""
    c = fmap.shape[-1]
    if (fh, fw) != tuple(fmap.shape[1:3]):
        fmap = jax.image.resize(fmap, (1, fh, fw, c), method="bilinear")
    return l2_normalize(fmap, axis=-1).reshape(fh * fw, c)


@partial(jax.jit, static_argnames=("rematch", "relax_cells", "grid_w"))
def _match_masked(bank, featt, mask_cell, cached_src, cached_valid, rematch,
                  relax_cells=0, grid_w=None):
    """Per-call masked matching: fresh (rematch) or cached-filtered.

    THE single implementation of the matching policy — the host loop
    (`get_coarse`), the rotation pre-test (`dispatch_inlier_count`), and
    the device-resident loop (multihomo `_fused_multi_homo`) all call it,
    so the rematch/cache semantics cannot diverge between paths.

    relax_cells/grid_w: the opt-in relaxed back-match reciprocity
    (ops/matching.mutual_matching) — the anchor-stride mode's companion.
    Cached (non-rematch) matches apply it where the cache was built
    (set_target), so only the fresh path consumes it here.
    """
    if rematch:
        res = mutual_matching(bank.T, featt.T, validB=mask_cell,
                              relax_cells=relax_cells, grid_w=grid_w)
        return res.src_idx, res.valid
    return cached_src, cached_valid & mask_cell


def _homogeneous_matches(coords_a, coords_b, src_idx):
    """(m1, m2) homogeneous match arrays keyed by target cell."""
    ones = jnp.ones((coords_b.shape[0], 1), jnp.float32)
    m1 = jnp.concatenate([coords_a[src_idx], ones], axis=1)
    m2 = jnp.concatenate([coords_b, ones], axis=1)
    return m1, m2


@partial(jax.jit, static_argnames=("fh", "fw"))
def _mask_to_cells(mask_full, fh, fw):
    """Full-res exclusion mask (Ht, Wt) -> per-feature-cell KEEP mask (nB,).

    Mirrors the reference: bilinear-interpolate (1 - mask) to the feature
    grid and threshold > 0.5
    (evaluation/evalHpatch/coarseAlignFeatMatch.py:158-162).
    """
    keep = 1.0 - mask_full
    cell = interpolate_bilinear(keep[None, :, :, None], fh, fw)[0, :, :, 0]
    return (cell > 0.5).reshape(-1)


class CoarseAligner:
    """Multi-scale coarse alignment (homography or affine).

    Args:
      resnet_params: ResNet-50 trunk params (torchvision or MoCo weights).
      nb_scale: source pyramid size (default 7).
      n_iter: RANSAC hypothesis count.
      tolerance: inlier threshold in normalized units.
      transform: 'homography' | 'affine'.
      min_size: resized image min (or max, see resize_mode) dimension.
      scale_r: pyramid scale range (scaleR..1/scaleR).
      resize_mode: 'min' (eval harnesses) | 'max' (quick_start demo).
      rematch_per_call: re-match masked target features on every getCoarse
        (quick_start/YFCC behavior) instead of filtering cached matches
        (eval-harness behavior).
      polish_fp64: re-solve the winning minimal set on host in fp64.
      seed: PRNG seed for hypothesis sampling (a fresh fold per call).
      device: optional jax.Device to pin this aligner's arrays to — pass
        per-device-placed resnet_params with it (see eval/pooled.py for
        the multi-device eval pool this enables).
      stem_s2d: run the trunk's conv1 as the exact space-to-depth rewrite
        (models/resnet50.py `_stem_s2d`) — opt-in; reassociates fp sums,
        keep off for bit-level parity runs (and see the negative
        end-to-end result in its docstring).
      adaptive_chunk: > 0 switches RANSAC (here and in the fused
        multi-homography loop) to confidence-based early termination
        (`ops.ransac.ransac_homography_adaptive`) with this hypothesis
        block size; n_iter becomes the cap instead of the exact count.
        0 = fixed-count parity default. Ignored when injected_samples
        is used (the deterministic parity mode needs the exact set).
      anchor_stride: > 0 runs the trunk only at every k-th pyramid scale
        (index 0 first) and derives the remaining scales' bank rows by
        bilinearly resampling the nearest anchor's pre-normalization
        feature map (re-L2-normalized) — the same opt-in approximation as
        `pipeline/fused._coarse_match` (+28% serving throughput measured
        at stride 3; quality cost quantified in docs/PERFORMANCE.md).
        0 = exact per-scale trunk (reference-parity default).
      relax_cells: > 0 accepts a match when the back-match lands within
        this Chebyshev radius in target cells instead of exact-index
        reciprocity (ops/matching.mutual_matching) — repairs the anchor
        mode's vote-splitting losses (resampled near-duplicate bank rows
        shift the back-match by ~1 cell; docs/PERFORMANCE.md round-5
        anchor section). 0 = reference semantics (parity default); only
        worth opting into together with anchor_stride.
    """

    def __init__(
        self,
        resnet_params,
        nb_scale=7,
        n_iter=10000,
        tolerance=0.05,
        transform="homography",
        min_size=400,
        scale_r=2.0,
        resize_mode="min",
        rematch_per_call=False,
        polish_fp64=True,
        seed=0,
        device=None,
        stem_s2d=False,
        adaptive_chunk=0,
        anchor_stride=0,
        relax_cells=0,
    ):
        self.params = resnet_params
        self.device = device
        self.stem_s2d = bool(stem_s2d)
        self.adaptive_chunk = int(adaptive_chunk)
        self.anchor_stride = int(anchor_stride)
        self.relax_cells = int(relax_cells)
        self.n_iter = int(n_iter)
        self.tolerance = float(tolerance)
        self.transform = transform
        self.n_points = 3 if transform == "affine" else 4
        self.min_size = int(min_size)
        self.scales = scale_list(nb_scale, scale_r)
        self.resize_mode = resize_mode
        self.rematch = bool(rematch_per_call)
        self.polish_fp64 = bool(polish_fp64)
        self.seed = int(seed)
        self._key = jax.random.PRNGKey(seed)
        self._resize = resize_min_size if resize_mode == "min" else resize_max_size

    def _put(self, arr):
        """Host array -> device array, pinned to self.device when set."""
        if self.device is not None:
            return jax.device_put(jnp.asarray(arr), self.device)
        return jnp.asarray(arr)

    def put(self, arr):
        """Public host->device transfer pinned to this aligner's device.

        Eval harnesses that interleave their own fine-stage arrays with this
        aligner's dispatches (eval/kitti.py) must place them on the same
        device; this is the supported way to do that.
        """
        return self._put(arr)

    def reseed(self, index, seed=None):
        """Reset the RANSAC PRNG stream to fold_in(PRNGKey(seed), index).

        Gives each pair a deterministic hypothesis stream independent of
        visit order, so --beginIndex/--endIndex restarts and device pools of
        any size produce bit-identical artifacts (improves on the reference's
        single global seed, evalKITTI/evaluation.py:182-183).
        """
        if seed is None:
            seed = self.seed
        self._key = self._put(
            jax.random.fold_in(jax.random.PRNGKey(seed), index)
        )

    # -- pair setup ---------------------------------------------------------

    def set_source(self, img):
        """Extract the multi-scale source feature bank. `img` is PIL."""
        feats, xs, ys = [], [], []
        imgs = [
            self._resize(img, int(self.min_size * s)) for s in self.scales
        ]
        # mid-scale image is the one warped later (reference keeps IsList[n//2])
        self.src_img = imgs[len(self.scales) // 2]
        self.src_array = to_array(self.src_img)
        arrs = [to_array(im) for im in imgs]
        if self.anchor_stride:
            # opt-in approximation (see ctor docstring / fused._coarse_match):
            # trunk only at anchor scales, neighbors feature-resampled from
            # the nearest anchor in log-area
            anchors = list(range(0, len(arrs), self.anchor_stride))
            amaps = {
                i: _coarse_feat_map(self.params, self._put(arrs[i])[None],
                                    stem_s2d=self.stem_s2d)
                for i in anchors
            }
            log_area = [
                0.5 * math.log(float(a.shape[0] * a.shape[1])) for a in arrs
            ]
        for j, arr in enumerate(arrs):
            fh, fw = arr.shape[0] // STRIDE_NET, arr.shape[1] // STRIDE_NET
            if self.anchor_stride:
                i = min(anchors, key=lambda a: abs(log_area[a] - log_area[j]))
                f = _anchor_resample_feats(amaps[i], fh, fw)
            else:
                f = _coarse_feats(self.params, self._put(arr)[None],
                                  stem_s2d=self.stem_s2d)
            y, x = feature_cell_coords(fh, fw)
            feats.append(f)
            xs.append(x)
            ys.append(y)
        self._bank = jnp.concatenate(feats, axis=0)  # (nA, 1024)
        self._coordsA = jnp.stack(
            [jnp.concatenate(xs), jnp.concatenate(ys)], axis=1
        )  # (nA, 2)

    def set_target(self, img):
        """Extract target features and (unless rematch mode) cache matches."""
        self.tgt_img = self._resize(img, self.min_size)
        self.tgt_array = to_array(self.tgt_img)
        self._featt = _coarse_feats(
            self.params, self._put(self.tgt_array)[None],
            stem_s2d=self.stem_s2d,
        )
        self.feat_h = self.tgt_array.shape[0] // STRIDE_NET
        self.feat_w = self.tgt_array.shape[1] // STRIDE_NET
        y, x = feature_cell_coords(self.feat_h, self.feat_w)
        self._coordsB = jnp.stack([x, y], axis=1)  # (nB, 2)
        if not self.rematch:
            res = mutual_matching(self._bank.T, self._featt.T,
                                  relax_cells=self.relax_cells,
                                  grid_w=self.feat_w)
            self._cached_src, self._cached_valid = res.src_idx, res.valid
        else:
            n_b = self._featt.shape[0]
            self._cached_src = jnp.zeros((n_b,), jnp.int32)
            self._cached_valid = jnp.zeros((n_b,), bool)

    def set_pair(self, img_src, img_tgt):
        self.set_source(img_src)
        self.set_target(img_tgt)

    # -- per-iteration coarse fit ------------------------------------------

    def get_coarse(self, exclusion_mask=None, injected_samples=None):
        """Fit the dominant transform on the not-yet-excluded target region.

        Args:
          exclusion_mask: (Ht, Wt) float/bool array, 1 = exclude (already
            matched / sky). None = use everything.
          injected_samples: optional (n, n_points) int array of target-cell
            indices to use as the minimal sets INSTEAD of PRNG sampling —
            the deterministic parity mode (SURVEY.md §7): with identical
            minimal sets the solve/score/select pipeline can be compared
            against the reference directly
            (tests/test_reference_harness.py).

        Returns (H21, inlier_mask_image) where H21 is a float32 (3, 3)
        numpy array mapping target normalized coords to source normalized
        coords, or (None, None) when no model is found; inlier_mask_image
        marks inlier target cells on the (feat_h, feat_w) grid.
        """
        ht, wt = self.tgt_array.shape[:2]
        if exclusion_mask is None:
            exclusion_mask = np.zeros((ht, wt), np.float32)
        mask_cell = _mask_to_cells(
            self._put(np.asarray(exclusion_mask, np.float32)),
            self.feat_h, self.feat_w,
        )
        src_idx, valid = _match_masked(
            self._bank,
            self._featt,
            mask_cell,
            self._cached_src,
            self._cached_valid,
            self.rematch,
            self.relax_cells,
            self.feat_w,
        )
        m1, m2 = _homogeneous_matches(self._coordsA, self._coordsB, src_idx)

        if int(jnp.sum(valid)) < self.n_points:
            return None, None

        self._key, sub = jax.random.split(self._key)
        if injected_samples is not None:
            injected_samples = jnp.asarray(injected_samples, jnp.int32)
        if self.adaptive_chunk and injected_samples is None:
            res, _ = ransac_homography_adaptive(
                sub,
                m1,
                m2,
                valid,
                self.tolerance,
                n_iter=self.n_iter,
                chunk=self.adaptive_chunk,
                n_points=self.n_points,
                transform=self.transform,
            )
        else:
            res = ransac_homography(
                sub,
                m1,
                m2,
                valid,
                self.tolerance,
                n_iter=(
                    self.n_iter if injected_samples is None
                    else injected_samples.shape[0]
                ),
                n_points=self.n_points,
                transform=self.transform,
                injected_samples=injected_samples,
            )
        if not bool(res.found):
            return None, None

        H = np.asarray(res.H21, np.float64)
        if self.polish_fp64 and self.transform == "homography":
            sample = np.asarray(res.best_sample)
            Xs = np.asarray(m1)[sample, :2]
            Ys = np.asarray(m2)[sample, :2]
            H = dlt_homography_np(Xs, Ys)

        inlier = np.asarray(res.inlier_mask).reshape(self.feat_h, self.feat_w)
        return H.astype(np.float32), inlier.astype(np.float32)

    def dispatch_inlier_count(self, exclusion_mask=None, key=None):
        """Dispatch a coarse RANSAC and return its inlier count WITHOUT
        syncing (a () int32 device scalar; 0 when no model is found).

        The YFCC rotation pre-test (reference:
        evaluation/evalYFCC/evaluation.py:190-209) only needs the four
        rotations' inlier counts, not the transforms — `get_coarse` would
        block the host twice per rotation on the dev tunnel. Dispatching all
        four scores first and reading them back together keeps the device
        pool busy (see eval/pooled.py `pooled_yfcc_predict`).

        Scoring matches `pick_rotation`'s sequential arithmetic: the count is
        `inlier_mask.sum()` when a model is found, else 0 (RansacResult.found
        already folds in the not-enough-matches case).
        """
        ht, wt = self.tgt_array.shape[:2]
        if exclusion_mask is None:
            exclusion_mask = np.zeros((ht, wt), np.float32)
        mask_cell = _mask_to_cells(
            self._put(np.asarray(exclusion_mask, np.float32)),
            self.feat_h,
            self.feat_w,
        )
        src_idx, valid = _match_masked(
            self._bank,
            self._featt,
            mask_cell,
            self._cached_src,
            self._cached_valid,
            self.rematch,
            self.relax_cells,
            self.feat_w,
        )
        m1, m2 = _homogeneous_matches(self._coordsA, self._coordsB, src_idx)
        if key is None:
            self._key, key = jax.random.split(self._key)
        if self.adaptive_chunk:
            # keep the dispatch twin on the SAME RANSAC mode as
            # pick_rotation's get_coarse path, so both score rotations
            # with identical hypothesis streams under --adaptiveChunk
            res, _ = ransac_homography_adaptive(
                key,
                m1,
                m2,
                valid,
                self.tolerance,
                n_iter=self.n_iter,
                chunk=self.adaptive_chunk,
                n_points=self.n_points,
                transform=self.transform,
            )
        else:
            res = ransac_homography(
                key,
                m1,
                m2,
                valid,
                self.tolerance,
                n_iter=self.n_iter,
                n_points=self.n_points,
                transform=self.transform,
            )
        # sum the reprojection-error mask, NOT res.num_inliers: the matmul
        # scoring path and the mask's einsum+sqrt path can disagree by 1 on
        # knife-edge correspondences, and `pick_rotation` (the sequential
        # twin of this dispatch) sums the mask — both paths must pick the
        # same rotation for the same pair
        return jnp.where(
            res.found, jnp.sum(res.inlier_mask.astype(jnp.int32)), 0
        )

    @property
    def num_cached_matches(self):
        return int(jnp.sum(self._cached_valid))
