"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.9); its scale axes
(batch-of-pairs, batch-of-scales, batch-of-RANSAC-hypotheses) are all
embarrassingly parallel, so the TPU-native design is a 1-D data mesh for
training/eval-batch sharding plus hypothesis sharding for RANSAC — all XLA
collectives over ICI, no custom backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ransacflow_tpu.ops.ransac import ransac_homography


def make_mesh(n_devices=None, axis="data", devices=None):
    """1-D mesh over the first n devices (or an explicit device list).

    `jax.devices()` is GLOBAL: under multi-process JAX (one process per
    host of a pod slice, `jax.distributed.initialize()`) it lists every
    device of every process, so the default mesh already spans hosts —
    the multi-host story is a data-sharding question (train/loop.py), not
    a mesh question. Pass `devices` to pin an explicit list/order (tests
    use a permuted list to prove layout-independence).
    """
    if devices is None:
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


def sharded_align_pairs(mesh, resnet_params, align_params, pyramids, targets,
                        keys, tolerance=0.05, n_iter=10000, kernel_size=7,
                        cycle_match=True, adaptive_chunk=0, anchor_stride=0,
                        relax_cells=0):
    """Shard a batch of same-shape pairs across the mesh and run the fused
    coarse+fine program on each device's shard (the v5e-8 serving layout:
    pairs are embarrassingly parallel, params replicated, zero collectives
    in the hot path).

    Args:
      pyramids: tuple of (K, 1, Hi, Wi, 3) stacked scale images, K divisible
        by the mesh size.
      targets: (K, 1, Ht, Wt, 3); keys: (K, 2).
    Returns stacked outputs with leading axis K (gathered).
    """
    from ransacflow_tpu.pipeline.fused import fused_align_batch

    n_dev = mesh.devices.size
    assert targets.shape[0] % n_dev == 0, (
        f"mesh size ({n_dev}) must divide the pair count "
        f"({targets.shape[0]}) — pad or bucket the batch"
    )

    def local(pyrs, tgts, ks):
        return fused_align_batch(
            resnet_params, align_params, tuple(pyrs), tgts, ks,
            tolerance, n_iter, kernel_size, cycle_match,
            adaptive_chunk=adaptive_chunk, anchor_stride=anchor_stride,
            relax_cells=relax_cells,
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    pyr_r = tuple(jax.device_put(p, NamedSharding(mesh, P("data")))
                  for p in pyramids)
    return f(pyr_r, shard_batch(targets, mesh), shard_batch(keys, mesh))


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
        check_vma=False,
    )
    return f(keys, match1, match2, valid)
