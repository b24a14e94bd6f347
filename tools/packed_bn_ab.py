"""A/B: FIERY_PACKED_BN on/off for future_prediction fwd+bwd and the full train step."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os, time
import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.models.fiery import FieryConfig
from fiery_tpu.models.future_prediction import FuturePrediction
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.data.synthetic import SyntheticFutureDataset

cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16, 'BATCHSIZE': 3})
mc = FieryConfig.from_cfg(cfg)
dt = jnp.bfloat16
key = jax.random.key(0)

def timeit(name, fn, *args, n=20):
    t0 = time.time(); out = fn(*args); jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f'{name:<46s} {(time.time()-t0)/n*1e3:8.1f} ms  (compile {c:.0f}s)', flush=True)

fp = FuturePrediction(in_channels=64, n_gru_blocks=mc.n_gru_blocks,
                      n_res_layers=mc.n_res_layers, bn_momentum=mc.bn_momentum, dtype=dt)
lat = jax.random.normal(key, (3, 4, 200, 200, 32), dt)
hid = jax.random.normal(key, (3, 200, 200, 64), dt)
fp_vars = jax.jit(fp.init, static_argnames='train')({'params': key}, lat, hid, train=True)

def fp_fwdbwd(p, lat, hid):
    def loss(pp):
        out, _ = fp.apply({'params': pp, 'batch_stats': fp_vars['batch_stats']},
                          lat, hid, train=True, mutable=['batch_stats'])
        return out.astype(jnp.float32).sum()
    return jax.grad(loss)(p)

for flag in ('0', '1'):
    os.environ['FIERY_PACKED_BN'] = flag
    timeit(f'future_prediction fwd+bwd packed={flag}', jax.jit(fp_fwdbwd),
           fp_vars['params'], lat, hid)

trainer = Trainer(cfg)
ds = SyntheticFutureDataset(cfg, n_samples=3, n_instances=2, seed=0)
b = {k: jnp.asarray(v) for k, v in ds.get_batch([0, 1, 2]).items()}
state = jax.jit(trainer.init_state)(jax.random.key(0), b)
rng = jax.random.key(1)
for flag in ('0', '1'):
    os.environ['FIERY_PACKED_BN'] = flag
    step = jax.jit(trainer.train_step)
    timeit(f'full train_step packed={flag}', step, state, b, rng, n=10)
