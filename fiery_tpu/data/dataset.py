"""Dataloading: batch iterator + dataset dispatch.

Replaces the reference's torch DataLoader plumbing (/root/reference/fiery/data.py:429-462)
with a host-side iterator feeding jnp batches. Dataset backends:
  * 'synthetic' — in-memory scripted dataset (tests/bench, no external deps);
  * 'nuscenes' / 'lyft' — real datasets via fiery_tpu.data.nuscenes_dataset (requires
    the nuscenes-devkit / lyft SDK and a dataroot, like the reference).
"""

import multiprocessing as mp
import threading
import queue as queue_mod

import numpy as np

_WORKER_DATASET = None
_WORKER_TRANSFORM = None


def _worker_init(dataset, transform=None):
    global _WORKER_DATASET, _WORKER_TRANSFORM
    _WORKER_DATASET = dataset
    _WORKER_TRANSFORM = transform


def _worker_load(idx):
    samples = [_WORKER_DATASET[int(i)] for i in idx]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    if _WORKER_TRANSFORM is not None:
        batch = _WORKER_TRANSFORM(batch)
    return batch


def _worker_backend_probe(_=None):
    """Report whether this worker process initialized a JAX backend.

    Workers must stay numpy-only: the accelerator belongs to the parent
    process, and a worker that initializes JAX tries to claim it — observed as
    a permanent pool deadlock when the device was unreachable (each worker
    hung inside backend init, and pool.imap waits forever on lost tasks). The
    data path (dataset __getitem__, label gen, prewarp transform) is written
    jax-free; tests/test_dataloader.py pins that with this probe.
    """
    import sys
    if sys.modules.get('jax') is None:
        return 'jax-not-imported'
    from jax._src import xla_bridge
    return ('jax-initialized' if xla_bridge.backends_are_initialized()
            else 'jax-imported-uninitialized')

from fiery_tpu.data.synthetic import SyntheticFutureDataset


class DataLoader:
    """Minimal host dataloader: shuffling, batching, drop_last, background prefetch.

    Multi-host: pass (process_index, process_count) to have each host read a disjoint
    shard of every (deterministically shuffled) epoch — the per-host batches then
    concatenate to the global batch under jit (jax.make_array_from_process_local_data).

    num_workers > 0 uses a forkserver pool (JAX runtime threads are not fork-safe),
    so the standard multiprocessing rules apply: the calling script needs an
    ``if __name__ == '__main__'`` guard, and scripts piped via stdin can't spawn
    workers (the child can't re-import ``__main__``); the pool pings a worker at
    startup so such setups fail fast instead of respawning workers forever.
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False, seed=0,
                 prefetch=4, num_workers=0, process_index=0, process_count=1,
                 transform=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.process_index = process_index
        self.process_count = process_count
        # batch-level host transform (stacked numpy batch -> batch), applied in
        # the worker/prefetch thread — e.g. label pre-warping (data/label_warp.py)
        self.transform = transform
        self._epoch = 0
        self._pool = None

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0:
            # forkserver, NOT fork: the pool is created lazily on first epoch,
            # by which point jax has spun up its runtime threads — forking a
            # multithreaded process deadlocks (observed: train.py hung until
            # timeout on the first real-data run). forkserver workers fork from
            # a clean spawned server process; dataset/transform ship by pickle.
            ctx = mp.get_context('forkserver')
            self._pool = ctx.Pool(self.num_workers, initializer=_worker_init,
                                  initargs=(self.dataset, self.transform))
            # Fail fast instead of looping forever: a worker that dies on
            # arrival (unpicklable dataset/transform, or a __main__ that can't
            # be re-imported — e.g. a script piped via stdin) is silently
            # respawned by the pool ad infinitum. One ping with a timeout
            # turns that into an actionable error.
            try:
                self._pool.apply_async(int, (0,)).get(timeout=120)
            except Exception as e:
                self._pool.terminate()
                self._pool = None
                raise RuntimeError(
                    'data-loader worker pool failed its startup ping — workers '
                    'are dying on arrival (unpicklable dataset/transform, or '
                    'the __main__ module cannot be re-imported in a forkserver '
                    'child, e.g. when running from stdin/REPL). Use '
                    'num_workers=0 in that case.') from e
        return self._pool

    def shutdown(self):
        """Drain and close the worker pool (workers are daemonic, so this is
        optional hygiene — they die with the parent either way).

        close()+join(), not terminate(): a terminate() mid-epoch kills workers
        abruptly and can raise in / drop results from an iterator that still
        has batches in flight; close() lets queued work finish first."""
        if self._pool is not None:
            self._pool.close()
            self._pool.join()
            self._pool = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # same permutation on every host; each host takes a strided shard
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count > 1:
            order = order[self.process_index::self.process_count]
            n = len(order)
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
        pool = self._get_pool()
        if pool is not None:
            # parallel decode: keep `prefetch` batches in flight (the reference uses
            # N_WORKERS torch DataLoader workers, data.py:452-457)
            for out in pool.imap(_worker_load, batches):
                yield out
            return
        q = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            for idx in batches:
                samples = [self.dataset[int(i)] for i in idx]
                batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
                if self.transform is not None:
                    batch = self.transform(batch)
                q.put(batch)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def numeric_batch(batch):
    """Drop non-numeric entries (e.g. 'sample_token' string arrays) from a stacked
    batch so the remainder is safe to feed to jnp.asarray / device_put."""
    return {k: v for k, v in batch.items()
            if np.asarray(v).dtype.kind in 'biufc'}


def prepare_dataloaders(cfg, return_dataset=False, batch_size=None,
                        process_index=0, process_count=1):
    """Build (train_loader, val_loader) for the configured dataset.

    Reference: data.py:429-462 (train: shuffle + drop_last; val: sequential).
    batch_size overrides cfg.BATCHSIZE (e.g. the PER-HOST batch in data-parallel
    training, where cfg.BATCHSIZE stays the per-chip size like the reference's
    per-GPU BATCHSIZE, configs/baseline.yml:5). Multi-host: pass
    (process_index, process_count) so each host reads a disjoint shard of every
    deterministically-shuffled epoch.
    """
    name = cfg.DATASET.NAME
    if name == 'synthetic':
        n_train = cfg.DATASET.N_SYNTHETIC_SAMPLES
        train_ds = SyntheticFutureDataset(cfg, n_samples=n_train, seed=0)
        val_ds = SyntheticFutureDataset(cfg, n_samples=max(2, n_train // 4), seed=1000)
    elif name in ('nuscenes', 'lyft'):
        from fiery_tpu.data.nuscenes_dataset import build_real_datasets
        train_ds, val_ds = build_real_datasets(cfg)
    else:
        raise ValueError(f'Unknown dataset {name}')

    num_workers = cfg.N_WORKERS if name in ('nuscenes', 'lyft') else 0
    bs = cfg.BATCHSIZE if batch_size is None else batch_size
    transform = None
    if cfg.DATASET.PREWARP_LABELS:
        from fiery_tpu.data.label_warp import make_prewarp_transform
        transform = make_prewarp_transform(cfg)
    train_loader = DataLoader(train_ds, bs, shuffle=True, drop_last=True,
                              num_workers=num_workers,
                              process_index=process_index,
                              process_count=process_count,
                              transform=transform)
    val_loader = DataLoader(val_ds, bs, shuffle=False, drop_last=False,
                            num_workers=num_workers,
                            process_index=process_index,
                            process_count=process_count,
                            transform=transform)
    if return_dataset:
        return train_loader, val_loader, train_ds, val_ds
    return train_loader, val_loader
