"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.9); its scale axes
(batch-of-pairs, batch-of-scales, batch-of-RANSAC-hypotheses) are all
embarrassingly parallel, so the TPU-native design is a 1-D data mesh for
training/eval-batch sharding plus hypothesis sharding for RANSAC — all XLA
collectives over ICI, no custom backend.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental.shard_map import shard_map

from ransacflow_tpu.ops.ransac import ransac_homography


def make_mesh(n_devices=None, axis="data"):
    """1-D mesh over the first n local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh, axis="data"):
    """Shard leading axis of every leaf over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def sharded_ransac(mesh, key, match1, match2, valid, tolerance, n_iter=10000,
                   **kwargs):
    """RANSAC with hypotheses sharded over the mesh: each device scores
    n_iter / n_dev hypotheses against the full (replicated) match set, then
    the global argmax winner is reduced over ICI.

    The match arrays are tiny (padded to the target feature-cell count);
    replicating them and sharding the 10k-50k-hypothesis axis is the
    communication-optimal layout.
    """
    n_dev = mesh.devices.size
    per_dev = -(-n_iter // n_dev)

    def local(key_shard, m1, m2, v):
        res = ransac_homography(
            key_shard[0], m1, m2, v, tolerance, n_iter=per_dev, **kwargs
        )
        # reduce the best model over devices by inlier count
        counts = jax.lax.all_gather(res.num_inliers, "data")
        hs = jax.lax.all_gather(res.H21, "data")
        inl = jax.lax.all_gather(res.inlier_mask, "data")
        founds = jax.lax.all_gather(res.found, "data")
        samples = jax.lax.all_gather(res.best_sample, "data")
        best = jnp.argmax(counts)
        return type(res)(
            hs[best], counts[best], inl[best], founds[best], samples[best]
        )

    keys = jax.random.split(key, n_dev)
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return f(keys, match1, match2, valid)
