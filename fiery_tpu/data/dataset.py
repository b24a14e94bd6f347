"""Dataloading: batch iterator + dataset dispatch.

Replaces the reference's torch DataLoader plumbing (/root/reference/fiery/data.py:429-462)
with a host-side iterator feeding jnp batches. Dataset backends:
  * 'synthetic' — in-memory scripted dataset (tests/bench, no external deps);
  * 'nuscenes' / 'lyft' — real datasets via fiery_tpu.data.nuscenes_dataset (requires
    the nuscenes-devkit / lyft SDK and a dataroot, like the reference).
"""

import threading
import queue as queue_mod

import numpy as np

from fiery_tpu.data.synthetic import SyntheticFutureDataset


class DataLoader:
    """Minimal host dataloader: shuffling, batching, drop_last, background prefetch."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False, seed=0,
                 prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __iter__(self):
        self._epoch += 1
        batches = self._batch_indices()
        q = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            for idx in batches:
                samples = [self.dataset[int(i)] for i in idx]
                q.put({k: np.stack([s[k] for s in samples]) for k in samples[0]})
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def prepare_dataloaders(cfg, return_dataset=False):
    """Build (train_loader, val_loader) for the configured dataset.

    Reference: data.py:429-462 (train: shuffle + drop_last; val: sequential).
    """
    name = cfg.DATASET.NAME
    if name == 'synthetic':
        n_train = getattr(cfg.DATASET, 'N_SYNTHETIC_SAMPLES', None) or 16
        train_ds = SyntheticFutureDataset(cfg, n_samples=n_train, seed=0)
        val_ds = SyntheticFutureDataset(cfg, n_samples=max(2, n_train // 4), seed=1000)
    elif name in ('nuscenes', 'lyft'):
        from fiery_tpu.data.nuscenes_dataset import build_real_datasets
        train_ds, val_ds = build_real_datasets(cfg)
    else:
        raise ValueError(f'Unknown dataset {name}')

    train_loader = DataLoader(train_ds, cfg.BATCHSIZE, shuffle=True, drop_last=True)
    val_loader = DataLoader(val_ds, cfg.BATCHSIZE, shuffle=False, drop_last=False)
    if return_dataset:
        return train_loader, val_loader, train_ds, val_ds
    return train_loader, val_loader
