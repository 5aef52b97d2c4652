"""Pure-function geometry/numeric core. Everything here is jittable.

Conventions (used consistently across the framework):

- Images and feature maps are **channels-last**: ``(B, H, W, C)`` — the
  native TPU/XLA layout. (The PyTorch reference is NCHW; the weight
  converter in `models/convert.py` handles the transposition.)
- ``H`` indexes image rows (y), ``W`` indexes columns (x).
- Normalized coordinates are ``(x, y)`` pairs in ``[-1, 1]``; flow fields /
  sampling grids are ``(B, H, W, 2)`` with channel 0 = x (column) and
  channel 1 = y (row), matching `torch.nn.functional.grid_sample`.
- Homogeneous match points are ``(x, y, 1)`` triples. A homography ``H21``
  maps target (match2) points to source (match1) points, mirroring the
  reference's ``Homography(X, Y)`` which solves Y -> X
  (reference: utils/outil.py:68-87).
"""

from ransacflow_tpu.ops.grid import (
    normalized_grid,
    feature_cell_coords,
    feature_cell_indices,
)
from ransacflow_tpu.ops.sampler import (
    grid_sample,
    interpolate_bilinear,
    upsample_bilinear_x8,
    affine_grid,
)
from ransacflow_tpu.ops.homography import (
    warp_grid,
    apply_homography,
    dlt_homography,
    dlt_homography_np,
    fit_affine,
    fit_hough,
    fit_translation,
    reprojection_error,
)
from ransacflow_tpu.ops.saliency import saliency_coef
from ransacflow_tpu.ops.matching import mutual_matching
from ransacflow_tpu.ops.ransac import (
    ransac_homography,
    ransac_homography_adaptive,
    RansacResult,
)
from ransacflow_tpu.ops.blurpool import blur_pool, blur_pool_1d, binomial_filter
from ransacflow_tpu.ops.correlation import correlation_volume, corr_offset_grids
from ransacflow_tpu.ops.ssim import masked_ssim_loss, gaussian_window
