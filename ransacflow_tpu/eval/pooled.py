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

import itertools
from collections import deque

import jax
import numpy as np

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
    busy without accumulating results); `add_batch` enqueues one batched
    dispatch covering several pairs; `flush` drains the rest. Draining
    blocks on the loop result, finalizes it, and calls
    ``save_fn(idx, artifact, *extras)`` for each non-None prediction.
    """

    def __init__(self, n_devices, save_fn):
        self._pending = deque()
        self._bound = 2 * n_devices
        self._save_fn = save_fn
        self._size = 0

    def _drain_one(self):
        kind, payload = self._pending.popleft()
        if kind == "one":
            idx, final, bg, extras = payload
            self._size -= 1
            art = multi_homography_finalize(final, bg)
            if art is not None:
                self._save_fn(idx, art, *extras)
            return
        idxs, final, bgs, extras_list = payload
        self._size -= len(idxs)
        counts = np.asarray(final["count"])
        hs = np.asarray(final["hs"], np.float32)
        flows = np.asarray(final["flows"])
        matches = np.asarray(final["matches"])
        for i, idx in enumerate(idxs):
            n = int(counts[i])
            if n == 0:
                continue
            art = {
                "coarse_h": hs[i, :n],
                "fine_flow_down8": flows[i, :n],
                "fine_match_down8": matches[i, :n],
                "bg_mask": bgs[i].astype(bool),
            }
            self._save_fn(idx, art, *extras_list[i])

    def add(self, idx, final, bg, *extras):
        self._pending.append(("one", (idx, final, bg, extras)))
        self._size += 1
        while self._size > self._bound:
            self._drain_one()

    def add_batch(self, idxs, final, bgs, extras_list):
        """Enqueue one `_fused_multi_homo_batch` result covering `idxs`."""
        self._pending.append(("batch", (idxs, final, bgs, extras_list)))
        self._size += len(idxs)
        while self._size > self._bound:
            self._drain_one()

    def flush(self):
        while self._pending:
            self._drain_one()


class BatchedMultiHomoDispatcher:
    """Shape-bucketed batched dispatch of the multi-homography loop.

    Per-pair dispatch + readback costs ~120 ms/pair of host/tunnel overhead
    (pipeline/multihomo.py:203); grouping pairs whose resized shapes match
    into `_fused_multi_homo_batch` calls amortizes it to one dispatch and
    one readback per batch. Buckets are keyed by (device slot, source
    shape, target shape); a batch dispatches when `batch_pairs` entries
    accumulate, and `flush` dispatches the leftovers (singletons fall back
    to the per-pair device loop). Device placement: each *proxy key* (the
    caller's pre-resize shape signature, e.g. PIL sizes) is assigned a pool
    slot round-robin and rotated to the next slot each time one of its
    batches dispatches, so same-shape-heavy datasets still spread over the
    pool at batch granularity.

    Bit-identity: entries carry per-pair fold_in keys, and
    `_fused_multi_homo_batch` is bit-identical to per-pair
    `_fused_multi_homo` (tests/test_pipeline.py:218), so artifacts match
    the per-pair pooled path exactly.
    """

    def __init__(self, pool, drain, batch_pairs, max_coarse=10,
                 mask_region_th=0.01, cycle_match=True, kernel_size=7):
        self._pool = pool
        self._drain = drain
        self._batch_pairs = batch_pairs
        self._loop_kw = dict(max_coarse=max_coarse,
                             mask_region_th=mask_region_th,
                             cycle_match=cycle_match,
                             kernel_size=kernel_size)
        self._buckets = {}
        self._slot_of_proxy = {}
        self._rr = itertools.count()

    def slot(self, proxy_key):
        """Pool slot for a pair with this pre-resize shape signature; the
        caller must run set_pair/set_source on pool[slot]."""
        if proxy_key not in self._slot_of_proxy:
            self._slot_of_proxy[proxy_key] = (
                next(self._rr) % len(self._pool)
            )
        return self._slot_of_proxy[proxy_key]

    def add(self, proxy_key, idx, bg, key, *extras):
        """Snapshot the pair currently set on pool[slot(proxy_key)] into
        its shape bucket; dispatches the bucket when full."""
        import jax.numpy as jnp
        from ransacflow_tpu.pipeline.fine import fine_features

        slot = self.slot(proxy_key)
        aligner, ap = self._pool[slot]
        ht, wt = aligner.tgt_array.shape[:2]
        bg = (np.ones((ht, wt), np.float32) if bg is None
              else np.asarray(bg, np.float32))
        entry = {
            "idx": idx,
            "bank": aligner._bank,
            "featt": aligner._featt,
            "cs": aligner._cached_src,
            "cv": aligner._cached_valid,
            "src": jnp.asarray(aligner.src_array)[None],
            "ffine": fine_features(
                ap, jnp.asarray(aligner.tgt_array)[None]
            ),
            "bg": bg,
            "key": key,
            "extras": extras,
        }
        bkey = (slot, aligner.src_array.shape, aligner.tgt_array.shape)
        bucket = self._buckets.get(bkey)
        if bucket is None:
            # snapshot the shape-derived shared state + static config now:
            # the aligner may hold a different shape by dispatch time
            bucket = self._buckets[bkey] = {
                "slot": slot,
                "coords": (aligner._coordsA, aligner._coordsB),
                "static": dict(
                    feat_h=aligner.feat_h, feat_w=aligner.feat_w,
                    n_iter=aligner.n_iter, n_points=aligner.n_points,
                    transform=aligner.transform, rematch=aligner.rematch,
                    adaptive_chunk=aligner.adaptive_chunk,
                ),
                "tolerance": aligner.tolerance,
                "entries": [],
            }
        bucket["entries"].append(entry)
        if len(bucket["entries"]) >= self._batch_pairs:
            self._dispatch(bkey)
            # rotate this proxy's slot so its next batch lands on the next
            # device (keeps single-shape datasets parallel)
            self._slot_of_proxy[proxy_key] = (
                next(self._rr) % len(self._pool)
            )

    def _dispatch(self, bkey):
        import jax.numpy as jnp
        from ransacflow_tpu.pipeline.multihomo import (
            _fused_multi_homo,
            _fused_multi_homo_batch,
        )

        bucket = self._buckets.pop(bkey)
        entries = bucket["entries"]
        _, ap = self._pool[bucket["slot"]]
        coords_a, coords_b = bucket["coords"]
        lk = self._loop_kw
        static = dict(
            bucket["static"], max_coarse=lk["max_coarse"],
            cycle_match=lk["cycle_match"], kernel_size=lk["kernel_size"],
        )
        if len(entries) == 1:
            e = entries[0]
            final = _fused_multi_homo(
                ap, e["bank"], e["featt"], coords_a, coords_b,
                e["cs"], e["cv"], e["src"], e["ffine"],
                jnp.asarray(e["bg"]), e["key"],
                bucket["tolerance"], lk["mask_region_th"], **static,
            )
            self._drain.add(e["idx"], final, e["bg"], *e["extras"])
            return
        stack = lambda f: jnp.stack([e[f] for e in entries])  # noqa: E731
        final = _fused_multi_homo_batch(
            ap, stack("bank"), stack("featt"), coords_a, coords_b,
            stack("cs"), stack("cv"), stack("src"), stack("ffine"),
            jnp.asarray(np.stack([e["bg"] for e in entries])),
            jnp.stack([e["key"] for e in entries]),
            bucket["tolerance"], lk["mask_region_th"], **static,
        )
        self._drain.add_batch(
            [e["idx"] for e in entries], final,
            [e["bg"] for e in entries], [e["extras"] for e in entries],
        )

    def flush(self):
        for bkey in list(self._buckets):
            self._dispatch(bkey)
        self._drain.flush()


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
    batch_pairs=None,
):
    """Predict multi-homography artifacts for `pairs` over a device pool.

    Args:
      pairs: iterable of (idx, img_src PIL, img_tgt PIL, bg_mask or None).
      n_devices: pool size (1 = sequential fused path, same artifacts).
      coarse_kwargs: CoarseAligner kwargs (nb_scale, n_iter, tolerance, ...).
      save_fn: callable(idx, artifact_dict) invoked for each non-None
        prediction (e.g. artifacts.save_pair).
      seed: base PRNG seed; the per-pair key is fold_in(PRNGKey(seed), idx).
      batch_pairs: >1 groups same-resized-shape pairs into batched loop
        dispatches (BatchedMultiHomoDispatcher) — identical artifacts, one
        dispatch+readback per batch instead of per pair.
    """
    pool = make_device_pool(resnet_params, align_params, n_devices,
                            coarse_kwargs)
    base_key = jax.random.PRNGKey(seed)
    drain = PendingDrain(n_devices, save_fn)

    if batch_pairs and batch_pairs > 1:
        batcher = BatchedMultiHomoDispatcher(
            pool, drain, batch_pairs, max_coarse=max_coarse,
            mask_region_th=mask_region_th, cycle_match=cycle_match,
            kernel_size=kernel_size,
        )
        for idx, i_s, i_t, bg in pairs:
            proxy = (i_s.size, i_t.size)
            aligner, _ = pool[batcher.slot(proxy)]
            aligner.set_pair(i_s, i_t)
            batcher.add(proxy, idx, bg, jax.random.fold_in(base_key, idx))
        batcher.flush()
        return

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
