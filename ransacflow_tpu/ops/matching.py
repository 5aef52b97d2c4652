"""Dense mutual nearest-neighbor matching as one MXU matmul.

The reference computes ``score = featA^T @ featB`` then extracts mutual
argmax pairs with topk + scatter + nonzero (utils/outil.py:32-45), producing
variable-length index lists. Variable shapes don't jit, so here matches are
keyed by target cell: for each target feature cell ``j`` we return the best
source index and a validity flag — mutual matching is injective, so this
fixed-shape ``(nB,)`` representation is lossless.
"""

from typing import NamedTuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    """Mutual matches keyed by target cell (all shapes (nB,))."""

    src_idx: jnp.ndarray   # best source cell per target cell, int32
    valid: jnp.ndarray     # True where the pair is a mutual argmax, bool
    score: jnp.ndarray     # cosine score of the pair


def mutual_matching(featA, featB, validB=None, relax_cells=0, grid_w=None):
    """Mutual NN matching between L2-normalized feature banks.

    Args:
      featA: (C, nA) source features (multi-scale bank).
      featB: (C, nB) target features.
      validB: optional (nB,) mask; masked target cells behave as zero
        features, exactly like the reference's ``featt * MtTensor``
        (quick_start/coarseAlignFeatMatch.py:143).
      relax_cells: 0 (default) = exact-index reciprocity, the reference's
        semantics. > 0 = accept a pair when the back-match lands within
        this Chebyshev radius (in target feature cells) of the original
        cell. Exists for the anchor-stride approximation mode: resampled
        near-duplicate bank rows at neighboring pyramid levels split the
        target-side argmax vote, so the back-match lands one cell off and
        exact reciprocity drops a geometrically-correct match (measured:
        most anchor-mode losses sit at back-distance 1 — see
        docs/PERFORMANCE.md, round-5 anchor section). Keep 0 for
        reference-parity runs.
      grid_w: target feature-grid width (nB = grid_h * grid_w, row-major);
        required when relax_cells > 0 to turn flat indices into cells.

    A pair (i, j) is kept iff i is the argmax of column j AND j is the
    argmax of row i AND the score is nonzero (the reference's
    ``keepMaxDim0 * keepMaxDim1 > 0`` reduces to exactly this, since the
    product equals score^2 at mutual-argmax cells). Ties break to the first
    index, as in torch topk.
    """
    score = jnp.dot(
        featA.T, featB, preferred_element_type=jnp.float32
    )  # (nA, nB)
    if validB is not None:
        score = score * validB.astype(score.dtype)[None, :]

    best_src = jnp.argmax(score, axis=0)  # (nB,) best source per target
    best_tgt = jnp.argmax(score, axis=1)  # (nA,) best target per source

    nB = score.shape[1]
    cols = jnp.arange(nB)
    pair_score = score[best_src, cols]
    back = best_tgt[best_src]  # (nB,) where the back-match landed
    if relax_cells:
        if grid_w is None:
            raise ValueError("relax_cells > 0 requires grid_w")
        d_row = jnp.abs(back // grid_w - cols // grid_w)
        d_col = jnp.abs(back % grid_w - cols % grid_w)
        mutual = jnp.maximum(d_row, d_col) <= relax_cells
    else:
        mutual = back == cols
    valid = mutual & (pair_score != 0.0)
    return MatchResult(best_src.astype(jnp.int32), valid, pair_score)
