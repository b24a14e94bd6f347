"""Round-5: encoder space-to-channel packing A/B (FIERY_PACKED_ENCODER).

The r2 attribution left the EfficientNet mids (C=24/32/48, 4-5x lane padding)
as the biggest unpacked consumer after round-4 packed the GRU/temporal/
decoder. The packed encoder lowers every non-depthwise op onto the
(H, W/2, 2C) view (efficientnet.py MBConvBlock.packed_k — exact, slot-wise
1x1 convs at identical FLOPs); the depthwise convs stay unpacked with
reshape transitions whose writes replace (not add to) the unpacked buffers.

One process, back-to-back, fresh Trainer + fresh jit per arm (env flags are
read at trace time). All round-4 packing stays ON in both arms; the A/B is
the encoder extension alone.

Usage: python tools/encoder_packed_ab.py [dense|combo|all] [iters]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

BATCH = 3
COMBO = {'LIFT': {'TOPK': 8, 'WARP_FREE': True}}


def measure(tag, encoder_packed, cfg_extra=None, iters=10):
    from fiery_tpu.utils.config import get_cfg
    from fiery_tpu.training.trainer import Trainer
    from fiery_tpu.data.synthetic import SyntheticFutureDataset

    os.environ['FIERY_PACKED_ENCODER'] = str(encoder_packed)
    cfg_dict = {'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                'BATCHSIZE': BATCH}
    for k, v in (cfg_extra or {}).items():
        node = cfg_dict.setdefault(k, {})
        node.update(v)
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
    # real device sync (round-5 CLAUDE.md); the first pull in a process also
    # pays the one-time ~3 min d2h-channel init here, outside the timed loop
    float(metrics['total_loss'])
    print(f'[{tag}] compile+warm {time.time() - t0:.0f}s', flush=True)
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, b, rng)
    float(metrics['total_loss'])
    dt = (time.time() - t0) / iters
    print(f'RESULT [{tag}] {dt * 1e3:.1f} ms/step  {BATCH / dt:.2f} clips/s',
          flush=True)
    return dt


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if which in ('all', 'dense'):
        a = measure('dense encoder=0', 0, iters=iters)
        b = measure('dense encoder=2', 2, iters=iters)
        print(f'== dense encoder k=2: {a * 1e3:.1f} -> {b * 1e3:.1f} ms '
              f'({(a / b - 1) * 100:+.1f}%)', flush=True)
    if which in ('all', 'combo'):
        a = measure('combo encoder=0', 0, COMBO, iters=iters)
        b = measure('combo encoder=2', 2, COMBO, iters=iters)
        print(f'== combo encoder k=2: {a * 1e3:.1f} -> {b * 1e3:.1f} ms '
              f'({(a / b - 1) * 100:+.1f}%)', flush=True)
