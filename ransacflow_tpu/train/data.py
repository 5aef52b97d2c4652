"""Training data pipeline (host side).

Mirrors the reference's dataset of pre-aligned image groups named
``{index}_{1..cycle}.jpg`` (data/dataloader.py:44-71) and its
trainTransform (data/dataloader.py:24-37): random resize to one of
{crop, 1.5*crop, 2*crop} min-side (floored to a multiple of 8), the SAME
random crop and horizontal flip applied to both images of a pair.

A background-thread prefetcher keeps the device fed; per-host sharding for
multi-host training is a `shard_index/num_shards` split of the group list
(the TPU-native replacement for the vendored DistributedSampler,
SURVEY.md §2.9).
"""

import os
import queue
import threading

import numpy as np
from PIL import Image

from ransacflow_tpu.utils.image import to_array


def _resize_min8(img, min_size):
    w, h = img.size
    ratio = min(w / min_size, h / min_size)
    new_w = int(round(w / ratio)) // 8 * 8
    new_h = int(round(h / ratio)) // 8 * 8
    return img.resize((new_w, new_h), resample=Image.LANCZOS)


def train_transform(i1, i2, crop, rng, use_native=False):
    """Same-geometry augmentation for a pre-aligned pair. Returns arrays.

    With use_native, resizing runs through the C++ Lanczos resampler
    (ransacflow_tpu.native) on float arrays instead of PIL.
    """
    resize = int(rng.choice([crop, crop + crop // 2, crop * 2]))
    if use_native:
        from ransacflow_tpu.native import lanczos_resize

        a1 = np.asarray(i1, np.float32) / 255.0
        a2 = np.asarray(i2, np.float32) / 255.0
        h, w = a1.shape[:2]
        ratio = min(w / resize, h / resize)
        new_w = int(round(w / ratio)) // 8 * 8
        new_h = int(round(h / ratio)) // 8 * 8
        a1 = lanczos_resize(a1, new_h, new_w)
        a2 = lanczos_resize(a2, new_h, new_w)
        idw = rng.randint(new_w - crop) if new_w > crop else 0
        idh = rng.randint(new_h - crop) if new_h > crop else 0
        a1 = a1[idh : idh + crop, idw : idw + crop]
        a2 = a2[idh : idh + crop, idw : idw + crop]
        if rng.rand() >= 0.5:
            a1, a2 = a1[:, ::-1], a2[:, ::-1]
        return np.ascontiguousarray(a1), np.ascontiguousarray(a2)

    i1 = _resize_min8(i1, resize)
    i2 = _resize_min8(i2, resize)
    w, h = i1.size
    idw = rng.randint(w - crop) if w > crop else 0
    idh = rng.randint(h - crop) if h > crop else 0
    box = (idw, idh, idw + crop, idh + crop)
    i1, i2 = i1.crop(box), i2.crop(box)
    if rng.rand() >= 0.5:
        i1 = i1.transpose(Image.FLIP_LEFT_RIGHT)
        i2 = i2.transpose(Image.FLIP_LEFT_RIGHT)
    return to_array(i1), to_array(i2)


class PairFolder:
    """Image groups ``{index}_{1..cycle}.jpg``; samples 2 distinct views."""

    def __init__(self, img_dir, img_size=224, seed=0,
                 shard_index=0, num_shards=1, use_native=False):
        self.img_dir = img_dir
        self.cycle = 3 if os.path.exists(os.path.join(img_dir, "1_3.jpg")) else 2
        n_total = len(os.listdir(img_dir)) // self.cycle
        if num_shards > 1:
            # Every shard must hold the SAME number of groups: ranks run
            # lock-step psum'd DP steps, so a shorter shard means fewer
            # epoch_batches on that rank and the other ranks block forever
            # in a collective nobody joins. Pad by wrapping the index list
            # to ceil(n/num_shards)*num_shards before the rank-strided
            # slice — the same equalization the reference's
            # DistributedSampler does (segNet/lib/utils/data/
            # distributed.py:23-38).
            per_shard = -(-n_total // num_shards)
            padded = list(range(n_total))
            padded += padded[: per_shard * num_shards - n_total]
            self.indices = padded[shard_index::num_shards]
        else:
            self.indices = list(range(n_total))
        self.img_size = img_size
        self.rng = np.random.RandomState(seed)
        self.use_native = use_native

    def __len__(self):
        return len(self.indices)

    def sample(self, i):
        idx = self.indices[i]
        a, b = self.rng.choice(range(1, self.cycle + 1), 2, replace=False)
        i1 = Image.open(os.path.join(self.img_dir, f"{idx}_{a}.jpg")).convert("RGB")
        i2 = Image.open(os.path.join(self.img_dir, f"{idx}_{b}.jpg")).convert("RGB")
        return train_transform(i1, i2, self.img_size, self.rng,
                               use_native=self.use_native)

    def epoch_batches(self, batch_size, drop_last=True, shuffle=True):
        """Yield dicts {'I1': (B,H,W,3), 'I2': (B,H,W,3)} float32."""
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        n = len(order) // batch_size * batch_size if drop_last else len(order)
        for start in range(0, n, batch_size):
            chunk = order[start : start + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            pairs = [self.sample(i) for i in chunk]
            yield {
                "I1": np.stack([p[0] for p in pairs]),
                "I2": np.stack([p[1] for p in pairs]),
            }


def prefetch(iterator, depth=2):
    """Run `iterator` in a background thread with a bounded queue."""
    q = queue.Queue(maxsize=depth)
    _DONE = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_DONE)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _DONE:
            return
        yield item
