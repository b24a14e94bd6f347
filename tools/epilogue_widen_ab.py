"""Round-3 VERDICT #3 measurements, one process, back-to-back:

  A. FIERY_PACKED_EPILOGUE off/on at the dense parity config — does extending
     the packed-lane view through the BN epilogue (relu / residual-add,
     models/layers.py _apply_post) cut the elementwise/BN HBM traffic that the
     per-fusion trace shows running at 250-400 GB/s vs 819 peak?
  B. Same A/B at the best combo (LIFT.TOPK=8 + LIFT.WARP_FREE).
  C. Exact-width science probe: EXTRA_IN_CHANNELS=64 lifts the temporal/GRU
     width 70 -> 128 (full 128-lane vectors, 1.83x the *useful* channels). If
     lane padding were recoverable free bandwidth, this should be ~neutral;
     if buffers are physically lane-padded anyway, ~neutral means the padding
     is already paid and the 'gap' is an accounting artifact either way —
     the informative outcome is time GROWTH (i.e. padding was NOT physically
     stored/moved, refuting the widening idea).

jit caching gotcha (CLAUDE.md): env flags are read at TRACE time and jax.jit
caches by function identity — every config gets a fresh Trainer and a fresh
lambda so the flip actually retraces.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.data.synthetic import SyntheticFutureDataset

BATCH = 3


def measure(tag, epilogue, cfg_extra=None, iters=10):
    os.environ['FIERY_PACKED_EPILOGUE'] = '1' if epilogue else '0'
    cfg_dict = {'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                'BATCHSIZE': BATCH}
    for k, v in (cfg_extra or {}).items():
        node = cfg_dict
        *parents, leaf = k.split('.')
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = v
    cfg = get_cfg(cfg_dict=cfg_dict)
    trainer = Trainer(cfg)
    ds = SyntheticFutureDataset(cfg, n_samples=BATCH, n_instances=2, seed=0)
    b = {k: jnp.asarray(v) for k, v in ds.get_batch(list(range(BATCH))).items()}
    state = jax.jit(lambda r, bb: trainer.init_state(r, bb))(jax.random.key(0), b)
    step = jax.jit(lambda s, bb, r: trainer.train_step(s, bb, r),
                   donate_argnums=(0,))
    rng = jax.random.key(1)
    t0 = time.time()
    state, _ = step(state, b, rng)
    jax.block_until_ready(state)
    print(f'[{tag}] compile {time.time() - t0:.0f}s', flush=True)
    t0 = time.time()
    for _ in range(iters):
        state, _ = step(state, b, rng)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / iters
    print(f'RESULT [{tag}] {dt * 1e3:.1f} ms/step  {BATCH / dt:.2f} clips/s',
          flush=True)
    return dt


COMBO = {'LIFT.TOPK': 8, 'LIFT.WARP_FREE': True}
WIDE = {'MODEL.TEMPORAL_MODEL.EXTRA_IN_CHANNELS': 64}

if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'dense'):
        a = measure('dense epilogue=0', False)
        b = measure('dense epilogue=1', True)
        print(f'== dense: epilogue {a * 1e3:.1f} -> {b * 1e3:.1f} ms '
              f'({(a / b - 1) * 100:+.1f}%)', flush=True)
    if which in ('all', 'combo'):
        a = measure('combo epilogue=0', False, COMBO)
        b = measure('combo epilogue=1', True, COMBO)
        print(f'== combo: epilogue {a * 1e3:.1f} -> {b * 1e3:.1f} ms '
              f'({(a / b - 1) * 100:+.1f}%)', flush=True)
    if which in ('all', 'widen'):
        w = measure('dense widen70->128 epilogue=0', False, WIDE)
        print('== widen: compare against the dense epilogue=0 row above '
              '(1.83x useful temporal/GRU channels)', flush=True)
