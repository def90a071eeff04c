"""Loader behavior: static batch shapes (final-batch padding), error
propagation from the prefetch worker, and early-exit cleanup."""

import numpy as np
import pytest

from deepliif_tpu.data import Loader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'A': np.full((4, 4, 3), i, np.float32),
                'A_paths': f'img{i}.png'}


def test_final_batch_pads_to_static_shape():
    """5 samples, batch 2 -> three batches of EXACTLY 2 (the last pads by
    repeating its own samples, DistributedSampler-style): one jitted
    program shape, and a sharded device_put always divides."""
    ld = Loader(_ArrayDataset(5), batch_size=2, shuffle=False)
    batches = list(ld)
    assert len(batches) == 3
    assert all(b['A'].shape == (2, 4, 4, 3) for b in batches)
    # the pad repeats sample 4
    assert batches[2]['A'][0, 0, 0, 0] == 4 and batches[2]['A'][1, 0, 0, 0] == 4


def test_batch_size_one_never_pads():
    ld = Loader(_ArrayDataset(3), batch_size=1, shuffle=False)
    assert [b['A'].shape[0] for b in ld] == [1, 1, 1]


class _FailingDataset(_ArrayDataset):
    def __getitem__(self, i):
        if i == 2:
            raise OSError('truncated image file')
        return super().__getitem__(i)


def test_worker_errors_propagate():
    """A corrupt sample fails the epoch loudly instead of silently
    truncating it (training would otherwise run on a prefix of the data
    every epoch while logs claim full epochs)."""
    ld = Loader(_FailingDataset(6), batch_size=1, shuffle=False)
    with pytest.raises(RuntimeError, match='data loading failed'):
        list(ld)


def test_early_break_stops_producer():
    """Breaking out of the batch loop (--debug cap) releases the prefetch
    worker instead of leaving it blocked on a full queue forever."""
    import threading
    before = threading.active_count()
    for _ in range(5):
        ld = Loader(_ArrayDataset(64), batch_size=1, shuffle=False,
                    num_workers=1)
        for i, _b in enumerate(ld):
            if i == 1:
                break
    import time
    time.sleep(1.5)  # workers observe cancel within their 0.5s poll
    assert threading.active_count() <= before + 1
