"""Batch-size sweep of the train step (one process, sequential compiles)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.data.synthetic import SyntheticFutureDataset

for batch in [4, 2, 5]:
    cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                            'BATCHSIZE': batch})
    trainer = Trainer(cfg)
    ds = SyntheticFutureDataset(cfg, n_samples=batch, n_instances=2, seed=0)
    b = {k: jnp.asarray(v) for k, v in ds.get_batch(list(range(batch))).items()}
    state = jax.jit(trainer.init_state)(jax.random.key(0), b)
    step = jax.jit(trainer.train_step, donate_argnums=(0,))
    rng = jax.random.key(1)
    t0 = time.time()
    state, metrics = step(state, b, rng)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        state, metrics = step(state, b, rng)
    jax.block_until_ready(state)
    dt = (time.time() - t0) / 10
    print(f'batch {batch}: {dt*1e3:.1f} ms/step, {batch/dt:.2f} clips/s '
          f'(compile {compile_s:.0f}s)', flush=True)
    del state, step, trainer, b
