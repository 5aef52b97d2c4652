"""Feature self-similarity saliency (reference: utils/outil.py:167-176).

Mean cosine similarity of each feature cell with its 4 neighbors
(reflect padding). Defined by the reference but never called from its main
path; kept for API completeness.
"""

import jax.numpy as jnp


def saliency_coef(feat):
    """Args: feat (B, H, W, C). Returns (B, H, W, 1)."""
    padded = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    H, W = feat.shape[1:3]
    neighbors = [
        padded[:, 2 : 2 + H, 1 : 1 + W, :],  # down
        padded[:, 0:H, 1 : 1 + W, :],        # up
        padded[:, 1 : 1 + H, 0:W, :],        # left
        padded[:, 1 : 1 + H, 2 : 2 + W, :],  # right
    ]
    sims = [jnp.sum(feat * n, axis=-1, keepdims=True) for n in neighbors]
    return jnp.mean(jnp.stack(sims, axis=0), axis=0)
