"""Profile the baseline bf16 batch-3 train step on the real TPU; print op table."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.utils.profiling import summarise_trace

batch = 3
cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                        'BATCHSIZE': batch})
trainer = Trainer(cfg)
ds = SyntheticFutureDataset(cfg, n_samples=batch, n_instances=2, seed=0)
b = {k: jnp.asarray(v) for k, v in ds.get_batch(list(range(batch))).items()}
state = jax.jit(trainer.init_state)(jax.random.key(0), b)
rng = jax.random.key(1)
t0 = time.time()
# AOT compile once: the executable serves the loop AND provides the optimized
# HLO text so trace fusions can be attributed to source modules/shapes
step = jax.jit(trainer.train_step, donate_argnums=(0,)).lower(
    state, b, rng).compile()
print(f'compile: {time.time()-t0:.1f}s', flush=True)
import os as _os
_os.makedirs('/tmp/trace_r2', exist_ok=True)
with open('/tmp/trace_r2/hlo.txt', 'w') as f:
    f.write(step.as_text())
print('dumped optimized HLO', flush=True)
t0 = time.time()
state, metrics = step(state, b, rng)
jax.block_until_ready(state)
print(f'first step: {time.time()-t0:.1f}s', flush=True)

# warm + time
t0 = time.time()
for _ in range(10):
    state, metrics = step(state, b, rng)
jax.block_until_ready(state)
dt = (time.time() - t0) / 10
print(f'steady step: {dt*1e3:.1f} ms  ({batch/dt:.2f} clips/s)', flush=True)

trace_dir = '/tmp/trace_r2'
jax.profiler.start_trace(trace_dir)
for _ in range(3):
    state, metrics = step(state, b, rng)
jax.block_until_ready(state)
jax.profiler.stop_trace()

ranked, planes = summarise_trace(trace_dir, top=80)
total = sum(us for _, us in ranked)
print(f'planes: {sorted(set(planes))}')
print(f'{"us":>12}  {"%":>5}  op')
for name, us in ranked:
    print(f'{us:12.0f}  {100 * us / total:5.1f}  {name[:160]}')
