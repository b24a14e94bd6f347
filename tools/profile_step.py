"""Profile the bf16 batch-3 train step on the real TPU; print the op table.

Dumps the optimized HLO next to the XPlane trace so tools/fusion_attr.py can
join durations with shapes/scopes. Flags mirror bench.py's lever flags, so any
measured config can be attributed (e.g. the round-3 best config:
``python tools/profile_step.py --topk 8 --prewarp --warp-free
--trace-dir /tmp/trace_r3``).

CAVEAT (CLAUDE.md): trace capture through the axon tunnel inflates wall
durations ~20x — only RELATIVE per-op proportions are meaningful; scale them
by the steady-state step time this script prints before tracing.
"""
import argparse
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

parser = argparse.ArgumentParser()
parser.add_argument('--batch', type=int, default=3)
parser.add_argument('--topk', type=int, default=0)
parser.add_argument('--prewarp', action='store_true')
parser.add_argument('--warp-free', action='store_true')
parser.add_argument('--trim-train', action='store_true')
parser.add_argument('--trace-dir', default='/tmp/trace_r2')
args = parser.parse_args()

batch = args.batch
cfg = get_cfg(cfg_dict={'PRECISION': 16, 'BATCHSIZE': batch,
                        'LIFT': {'TOPK': args.topk, 'WARP_FREE': args.warp_free},
                        'MODEL': {'BN_MOMENTUM': 0.05,
                                  'TEMPORAL_MODEL': {'TRIM_TRAIN': args.trim_train}},
                        'DATASET': {'PREWARP_LABELS': args.prewarp}})
trainer = Trainer(cfg)
ds = SyntheticFutureDataset(cfg, n_samples=batch, n_instances=2, seed=0)
host_batch = ds.get_batch(list(range(batch)))
if args.prewarp:
    from fiery_tpu.data.label_warp import make_prewarp_transform
    host_batch = make_prewarp_transform(cfg)(host_batch)
b = {k: jnp.asarray(v) for k, v in host_batch.items()}
state = jax.jit(trainer.init_state)(jax.random.key(0), b)
rng = jax.random.key(1)
t0 = time.time()
# AOT compile once: the executable serves the loop AND provides the optimized
# HLO text so trace fusions can be attributed to source modules/shapes
step = jax.jit(trainer.train_step, donate_argnums=(0,)).lower(
    state, b, rng).compile()
print(f'compile: {time.time()-t0:.1f}s', flush=True)
trace_dir = args.trace_dir
os.makedirs(trace_dir, exist_ok=True)
with open(os.path.join(trace_dir, 'hlo.txt'), 'w') as f:
    f.write(step.as_text())
print('dumped optimized HLO', flush=True)
t0 = time.time()
state, metrics = step(state, b, rng)
# block_until_ready through the tunnel can return WITHOUT a device sync
# (round-5 CLAUDE.md): pull a real scalar instead. The first pull in a
# process also pays the one-time ~3 min d2h channel init here, keeping it
# out of the timed regions below.
float(metrics['total_loss'])
print(f'first step (incl d2h-channel init): {time.time()-t0:.1f}s', flush=True)

# warm + time
t0 = time.time()
for _ in range(10):
    state, metrics = step(state, b, rng)
float(metrics['total_loss'])   # real sync
dt = (time.time() - t0) / 10
print(f'steady step: {dt*1e3:.1f} ms  ({batch/dt:.2f} clips/s)', flush=True)

jax.profiler.start_trace(trace_dir)
for _ in range(3):
    state, metrics = step(state, b, rng)
float(metrics['total_loss'])   # real sync before stopping the trace
jax.profiler.stop_trace()

ranked, planes = summarise_trace(trace_dir, top=80)
total = sum(us for _, us in ranked)
print(f'planes: {sorted(set(planes))}')
print(f'{"us":>12}  {"%":>5}  op')
for name, us in ranked:
    print(f'{us:12.0f}  {100 * us / total:5.1f}  {name[:160]}')
