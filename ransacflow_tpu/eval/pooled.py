"""Multi-device eval pool: shard prediction pairs across local devices.

The reference scales eval by launching one process per GPU with manual
--beginIndex/--endIndex splits (evaluation/evalYFCC/evaluation.py:97-98).
The TPU-native equivalent keeps ONE process and round-robins pairs over the
local devices: each pair's whole program (feature bank, mutual matching,
device-resident multi-homography loop) is dispatched asynchronously onto
its device, and results are drained with a bounded pending queue — so all
chips compute concurrently while the host does PIL decode/resize for the
next pairs.

Eval pairs have per-pair image shapes, so this pair-level placement (not
shard_map, which needs one program over same-shape shards) is the honest
multi-chip layout; `sharded_align_pairs` (parallel/mesh.py) remains the
same-shape batch/serving layout.

Artifacts are bit-identical for any pool size: the RANSAC key is derived
per pair index (jax.random.fold_in), not from dispatch order.
"""

from collections import deque

import jax

from ransacflow_tpu.pipeline.coarse import CoarseAligner
from ransacflow_tpu.pipeline.multihomo import (
    multi_homography_dispatch,
    multi_homography_finalize,
)


def make_device_pool(resnet_params, align_params, n_devices, coarse_kwargs):
    """One (CoarseAligner, align_params) per local device, params pinned.

    Shared by every pooled eval entry (this module and eval/yfcc.py) so the
    placement scheme has a single implementation.
    """
    devices = jax.devices()[:n_devices]
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}"
    )
    pool = []
    for d in devices:
        rp = jax.device_put(resnet_params, d)
        ap = jax.device_put(align_params, d)
        pool.append((CoarseAligner(rp, device=d, **coarse_kwargs), ap))
    return pool


class PendingDrain:
    """Bounded queue of dispatched device-resident multi-homography loops.

    `add` enqueues a dispatched (idx, final, bg[, extras]) and drains down
    to the bound (two rounds of per-pair device arrays — keeps every device
    busy without accumulating results); `flush` drains the rest. Draining
    blocks on the loop result, finalizes it, and calls
    ``save_fn(idx, artifact, *extras)`` for each non-None prediction.
    """

    def __init__(self, n_devices, save_fn):
        self._pending = deque()
        self._bound = 2 * n_devices
        self._save_fn = save_fn

    def _drain_one(self):
        idx, final, bg, extras = self._pending.popleft()
        art = multi_homography_finalize(final, bg)
        if art is not None:
            self._save_fn(idx, art, *extras)

    def add(self, idx, final, bg, *extras):
        self._pending.append((idx, final, bg, extras))
        while len(self._pending) > self._bound:
            self._drain_one()

    def flush(self):
        while self._pending:
            self._drain_one()


def pooled_multihomo_predict(
    pairs,
    resnet_params,
    align_params,
    n_devices,
    coarse_kwargs,
    save_fn,
    max_coarse=10,
    mask_region_th=0.01,
    cycle_match=True,
    kernel_size=7,
    seed=0,
):
    """Predict multi-homography artifacts for `pairs` over a device pool.

    Args:
      pairs: iterable of (idx, img_src PIL, img_tgt PIL, bg_mask or None).
      n_devices: pool size (1 = sequential fused path, same artifacts).
      coarse_kwargs: CoarseAligner kwargs (nb_scale, n_iter, tolerance, ...).
      save_fn: callable(idx, artifact_dict) invoked for each non-None
        prediction (e.g. artifacts.save_pair).
      seed: base PRNG seed; the per-pair key is fold_in(PRNGKey(seed), idx).
    """
    pool = make_device_pool(resnet_params, align_params, n_devices,
                            coarse_kwargs)
    base_key = jax.random.PRNGKey(seed)
    drain = PendingDrain(n_devices, save_fn)

    for k, (idx, i_s, i_t, bg) in enumerate(pairs):
        aligner, ap = pool[k % n_devices]
        aligner.set_pair(i_s, i_t)
        final, bgf = multi_homography_dispatch(
            aligner, ap, max_coarse=max_coarse,
            mask_region_th=mask_region_th, cycle_match=cycle_match,
            bg_mask=bg, kernel_size=kernel_size,
            key=jax.random.fold_in(base_key, idx),
        )
        drain.add(idx, final, bgf)
    drain.flush()
