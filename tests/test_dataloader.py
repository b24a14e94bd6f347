"""DataLoader worker-pool tests.

The real-data path runs N_WORKERS forkserver processes (reference: torch
DataLoader workers, /root/reference/fiery/data.py:452-457). Regression
coverage for the two bugs that broke the first real-data CLI run:
  * fork-context pool deadlocked under JAX's runtime threads (now forkserver);
  * CfgNode failed to unpickle inside the workers (test_config.py covers the
    round-trip; here the whole dataset+transform ships through the pool).
"""

import numpy as np
import pytest

from fiery_tpu.data.dataset import DataLoader
from fiery_tpu.data.label_warp import make_prewarp_transform
from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.utils.config import get_cfg

pytestmark = pytest.mark.fast

TINY = {
    'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 2, 'BATCHSIZE': 2,
    'IMAGE': {'FINAL_DIM': (32, 48), 'NAMES': ['CAM_FRONT', 'CAM_BACK']},
    'LIFT': {'X_BOUND': [-4.0, 4.0, 0.5], 'Y_BOUND': [-4.0, 4.0, 0.5],
             'D_BOUND': [2.0, 6.0, 1.0]},
    'DATASET': {'N_SYNTHETIC_SAMPLES': 6},
}


def _collect(loader):
    return [batch for batch in loader]


def test_worker_pool_matches_in_process():
    """num_workers=2 (forkserver pool) must yield byte-identical batches to the
    in-process prefetch-thread path, in the same order — the dataset, cfg and
    prewarp transform all round-trip through pickle into the workers."""
    cfg = get_cfg(cfg_dict=TINY)
    ds = SyntheticFutureDataset(cfg, n_samples=6, seed=0)
    transform = make_prewarp_transform(cfg)

    ref_loader = DataLoader(ds, 2, shuffle=True, drop_last=True, seed=7,
                            num_workers=0, transform=transform)
    pool_loader = DataLoader(ds, 2, shuffle=True, drop_last=True, seed=7,
                             num_workers=2, transform=transform)
    try:
        ref_batches = _collect(ref_loader)
        pool_batches = _collect(pool_loader)
        assert len(pool_batches) == len(ref_batches) == 3
        for ref, got in zip(ref_batches, pool_batches):
            assert set(got) == set(ref)
            assert 'warped_label_stack' in got
            for k in ref:
                np.testing.assert_array_equal(np.asarray(got[k]),
                                              np.asarray(ref[k]), err_msg=k)
        # second epoch reuses the live pool and reshuffles
        again = _collect(pool_loader)
        assert len(again) == 3
        assert not all(
            np.array_equal(a['image'], b['image'])
            for a, b in zip(pool_batches, again)
        )
        # workers must never have initialized a JAX backend: the accelerator
        # belongs to the parent, and a worker claiming it deadlocks the pool
        # when the device is unreachable (regression: labels.py used the
        # device warp inside __getitem__)
        from fiery_tpu.data.dataset import _worker_backend_probe
        probes = {pool_loader._pool.apply(_worker_backend_probe)
                  for _ in range(4)}
        assert 'jax-initialized' not in probes, probes
    finally:
        pool_loader.shutdown()
