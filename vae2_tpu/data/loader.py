"""Prefetching batch loader: threaded decode + host->device overlap.

Replaces the reference's ``torch.utils.data.DataLoader`` + worker
subprocesses + ``DistributedSampler`` (reference tools/train.py:129-141):

- A thread pool decodes clips ahead of consumption (zip PNG decode releases
  the GIL inside zlib/PIL).
- Per-host sharding for multi-process training: each host iterates its
  ``process_index``-strided slice of the global batch list (replacing
  DistributedSampler, train.py:129-132).
- Batches are returned as uint8; normalization runs on-device inside the
  jitted step (see ``normalize_clips``).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .video import IMAGENET_MEAN, IMAGENET_STD, split_clips

Array = jax.Array


def normalize_clips(x: Array) -> Array:
    """uint8 (B, H, W, 3*F) -> normalized float (on device, fused into the
    step): /255, minus ImageNet mean, over std, tiled per frame
    (reference base_dataset.py:41-46, cityscapes.py:311-316)."""
    frames = x.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN), frames)
    std = jnp.tile(jnp.asarray(IMAGENET_STD), frames)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def denormalize_clips(x: Array) -> Array:
    """Inverse of normalize_clips, to [0, 255] float."""
    frames = x.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN), frames)
    std = jnp.tile(jnp.asarray(IMAGENET_STD), frames)
    return jnp.clip((x * std + mean) * 255.0, 0.0, 255.0)


class ClipLoader:
    """Iterates (batch, names) with a clip_num-way split into xt/x2t/x3t.

    Yields ``{'xt','x2t','x3t'}`` uint8 arrays of (B, H, W, 3*clip_length).
    ``set_epoch`` reshuffles deterministically per epoch (the
    DistributedSampler.set_epoch equivalent, train.py:298-299).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_threads: int = 4, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = max(1, prefetch)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> List[int]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (stride slicing, like DistributedSampler)
        return list(idx[self.process_index:: self.process_count])

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_batch(self, batch_idx: List[int]
                    ) -> Tuple[Dict[str, np.ndarray], List[str]]:
        samples = [self.dataset[i] for i in batch_idx]
        stacked = np.stack([s[0] for s in samples])  # (B, H, W, 3*L*N)
        names = [s[1] for s in samples]
        clips = split_clips(stacked, self.dataset.clip_length,
                            self.dataset.clip_num)
        keys = ["xt", "x2t", "x3t", "x4t", "x5t"][: len(clips)]
        return dict(zip(keys, clips)), names

    def __iter__(self) -> Iterator[Tuple[Dict[str, np.ndarray], List[str]]]:
        indices = self._indices()
        batches = [
            indices[i: i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if not batches:
            raise ValueError(
                f"Loader yields no batches: {len(indices)} samples on this "
                f"host < batch_size {self.batch_size} (drop_last="
                f"{self.drop_last}). Reduce TRAIN.BATCH_SIZE_PER_GPU or add "
                "data.")
        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            window = self.prefetch + 1
            futures = [pool.submit(self._load_batch, b)
                       for b in batches[:window]]
            next_submit = window
            for i in range(len(batches)):
                batch, names = futures[i].result()
                if next_submit < len(batches):
                    futures.append(
                        pool.submit(self._load_batch, batches[next_submit]))
                    next_submit += 1
                yield batch, names


class DevicePrefetcher:
    """Wraps a loader and eagerly transfers ``depth`` batches ahead of
    consumption, so host->device copies overlap device compute.

    ``put_fn`` maps a host batch dict to device arrays (e.g. the mesh
    shard_batch_fn); defaults to plain device_put. ``set_epoch`` forwards to
    the wrapped loader.
    """

    def __init__(self, loader, put_fn=None, depth: int = 2):
        self.loader = loader
        self.put_fn = put_fn or (lambda b: jax.tree.map(jax.device_put, b))
        self.depth = max(1, depth)

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self):
        queue: List = []
        for batch, names in self.loader:
            queue.append((self.put_fn(batch), names))
            if len(queue) >= self.depth:
                yield queue.pop(0)
        while queue:
            yield queue.pop(0)
