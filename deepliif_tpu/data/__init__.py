"""Data layer: dataset factory + batching loader with background prefetch.

Replaces the reference CustomDatasetDataLoader / torch DataLoader /
DistributedSampler stack (/root/reference/deepliif/data/__init__.py:58-131)
with a thread-prefetched numpy loader. Multi-host sharding = per-host index
striding (rank::world), the DistributedSampler equivalent; within one host
the jitted step consumes the whole batch and pjit shards it across chips.
"""

from __future__ import annotations

import queue
import random
import threading

import numpy as np

from .aligned import (AlignedDataset, SingleDataset,  # noqa: F401
                      UnalignedDataset)
from .transforms import apply_transform, get_params  # noqa: F401


def transform(img):
    """Inference-time single-image transform (reference data/__init__.py:
    133-138): make-power-of-2(4) bicubic + normalize to [-1,1], batch dim."""
    from ..utils import image_to_input
    return image_to_input(img)


def create_dataset(opt, phase='train'):
    mode = getattr(opt, 'dataset_mode', 'aligned')
    if mode == 'single':
        ds = SingleDataset(opt, phase)
    elif getattr(opt, 'model', '') == 'CycleGAN' or mode == 'unaligned':
        ds = UnalignedDataset(opt, phase)
    else:
        ds = AlignedDataset(opt, phase)

    # multi-host default: stride the index space by process (the
    # DistributedSampler equivalent); explicit opt.rank/world_size wins
    rank = getattr(opt, 'rank', None)
    world = getattr(opt, 'world_size', None)
    if rank is None or world is None:
        try:
            import jax
            rank = jax.process_index() if rank is None else rank
            world = jax.process_count() if world is None else world
        except Exception:
            rank, world = rank or 0, world or 1

    return Loader(
        ds,
        batch_size=getattr(opt, 'batch_size', 1),
        shuffle=(phase == 'train') and not getattr(opt, 'serial_batches', False),
        seed=getattr(opt, 'seed', None),
        rank=rank,
        world_size=world,
        num_workers=getattr(opt, 'num_threads', 2),
        max_dataset_size=getattr(opt, 'max_dataset_size', None),
    )


def _collate(samples):
    """Stack samples into a batch. 'B_mods'/'B_segs' get shape (M,B,H,W,C);
    everything else (B,...)."""
    out = {}
    for k in samples[0]:
        if k.endswith('_paths'):
            out[k] = [s[k] for s in samples]
        elif k in ('B_mods', 'B_segs'):
            out[k] = np.stack([s[k] for s in samples], axis=1)
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    """Epoch-based iterable over batches with optional thread prefetch."""

    def __init__(self, dataset, batch_size=1, shuffle=True, seed=None,
                 rank=0, world_size=1, num_workers=2, max_dataset_size=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.epoch = 0
        self.prefetch = max(1, num_workers)
        self.max_dataset_size = max_dataset_size

    def __len__(self):
        n = len(self.dataset)
        if self.max_dataset_size:
            n = min(n, self.max_dataset_size)
        return n

    def set_epoch(self, epoch):
        """Reshuffle differently each epoch (DistributedSampler.set_epoch)."""
        self.epoch = epoch

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random((self.seed or 0) * 100003 + self.epoch)
            rng.shuffle(idx)
        idx = idx[self.rank::self.world_size]
        if self.max_dataset_size:
            idx = idx[:self.max_dataset_size]
        return idx

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(_collate([self.dataset[i] for i in b]))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
