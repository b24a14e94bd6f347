"""Round-4: space-to-channel packed GRU rollout A/B (models/packed.py).

One process, back-to-back, fresh Trainer + fresh jit per config (env flags are
read at construction/trace time and jax.jit caches by function identity):

  A. FIERY_PACKED_SPACE 0 vs 2 (vs 4) at the dense parity config — the GRU
     tail + res blocks were ~67 ms of C=64 sub-ms fusions in the r2 dense
     attribution; packing should cut their physically lane-padded (2x) HBM
     traffic without the FLOP+byte growth that refuted channel widening.
  B. Same at the best combo (LIFT.TOPK=8 + LIFT.WARP_FREE + prewarped labels
     approximated by the synthetic set's fused warp — same graph shape).

Usage: python tools/packed_space_ab.py [dense|combo|all] [ks]
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


def measure(tag, packed_k, cfg_extra=None, iters=10, temporal=False,
            decoder=False):
    os.environ['FIERY_PACKED_SPACE'] = str(packed_k)
    os.environ['FIERY_PACKED_TEMPORAL'] = '1' if temporal else '0'
    os.environ['FIERY_PACKED_DECODER'] = '1' if decoder else '0'
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
    state, metrics = step(state, b, rng)
    # real device sync: block_until_ready through the tunnel can return
    # without syncing (round-5 CLAUDE.md); the first pull in a process also
    # pays the one-time ~3 min d2h-channel init here, outside the timed loop
    float(metrics['total_loss'])
    print(f'[{tag}] compile+warm {time.time() - t0:.0f}s', flush=True)
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, b, rng)
    float(metrics['total_loss'])   # real sync at loop end
    dt = (time.time() - t0) / iters
    print(f'RESULT [{tag}] {dt * 1e3:.1f} ms/step  {BATCH / dt:.2f} clips/s',
          flush=True)
    return dt


COMBO = {'LIFT.TOPK': 8, 'LIFT.WARP_FREE': True}

if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    ks = [int(x) for x in (sys.argv[2].split(',') if len(sys.argv) > 2 else [2])]
    if which in ('all', 'dense'):
        a = measure('dense packed_space=0', 0)
        for k in ks:
            bt = measure(f'dense packed_space={k}', k)
            print(f'== dense k={k}: {a * 1e3:.1f} -> {bt * 1e3:.1f} ms '
                  f'({(a / bt - 1) * 100:+.1f}%)', flush=True)
    if which in ('all', 'combo'):
        a = measure('combo packed_space=0', 0, COMBO)
        for k in ks:
            bt = measure(f'combo packed_space={k}', k, COMBO)
            print(f'== combo k={k}: {a * 1e3:.1f} -> {bt * 1e3:.1f} ms '
                  f'({(a / bt - 1) * 100:+.1f}%)', flush=True)
    if which == 'decoder':
        # GRU packing stays ON in both arms; the A/B is the decoder extension.
        for label, extra in (('dense', None), ('combo', COMBO)):
            a = measure(f'{label} gru-only', ks[0], extra)
            bt = measure(f'{label} gru+decoder', ks[0], extra, decoder=True)
            print(f'== {label} decoder k={ks[0]}: {a * 1e3:.1f} -> '
                  f'{bt * 1e3:.1f} ms ({(a / bt - 1) * 100:+.1f}%)', flush=True)
    if which == 'temporal':
        # GRU packing (the committed win) stays ON in both arms; the A/B is
        # the temporal-stack extension (FIERY_PACKED_TEMPORAL) on top of it.
        for label, extra in (('dense', None), ('combo', COMBO)):
            a = measure(f'{label} gru-only', ks[0], extra)
            bt = measure(f'{label} gru+temporal', ks[0], extra, temporal=True)
            print(f'== {label} temporal k={ks[0]}: {a * 1e3:.1f} -> '
                  f'{bt * 1e3:.1f} ms ({(a / bt - 1) * 100:+.1f}%)', flush=True)
