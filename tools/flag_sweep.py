"""Sweep TPU compiler options on the full train step (one process)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.data.synthetic import SyntheticFutureDataset

batch = 3
cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                        'BATCHSIZE': batch})
trainer = Trainer(cfg)
ds = SyntheticFutureDataset(cfg, n_samples=batch, n_instances=2, seed=0)
b = {k: jnp.asarray(v) for k, v in ds.get_batch(list(range(batch))).items()}
state0 = jax.jit(trainer.init_state)(jax.random.key(0), b)
rng = jax.random.key(1)

lowered = jax.jit(trainer.train_step).lower(state0, b, rng)

SETS = [
    ('baseline', {}),
    ('vmem98k', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('mlnlf', {'xla_tpu_enable_multi_level_nested_loop_fusion': 'true'}),
    ('licm2', {'xla_tpu_licm_size_inflation_ratio': '2.0'}),
    ('fcost', {'xla_tpu_enable_experimental_fusion_cost_model': 'true'}),
    ('vload', {'xla_tpu_vector_load_fusion_window': '2048',
               'xla_tpu_vector_store_fusion_window': '1024'}),
    ('scavenge+vmem', {'xla_tpu_scavenge_vmem_for_fusions': 'true',
                       'xla_tpu_scoped_vmem_limit_kib': '98304'}),
]

for name, opts in SETS:
    try:
        t0 = time.time()
        compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()
        ctime = time.time() - t0
        state, metrics = compiled(state0, b, rng)
        jax.block_until_ready(state)
        t0 = time.time()
        for _ in range(10):
            state, metrics = compiled(state, b, rng)
        jax.block_until_ready(state)
        dt = (time.time() - t0) / 10
        print(f'{name:<16s} {dt*1e3:8.1f} ms/step  {batch/dt:5.2f} clips/s  '
              f'(compile {ctime:.0f}s)', flush=True)
        del compiled, state
    except Exception as e:
        print(f'{name:<16s} FAILED: {str(e)[:160]}', flush=True)
