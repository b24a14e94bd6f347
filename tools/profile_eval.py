"""Profile the serving graph (eval forward, BN folded) on the real TPU.

Usage: python tools/profile_eval.py [topk] [warpfree] [e2e]
(default topk=8, the serving config; ``warpfree`` adds LIFT.WARP_FREE;
``e2e`` appends the jittable instance decode + device JV matching so their
share shows in the trace.)
Dumps optimized HLO + XPlane trace to /tmp/trace_eval for tools/fusion_attr.py.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.models.fiery import build_fiery
from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.utils.bn_fold import make_serving_fn
from fiery_tpu.utils.profiling import summarise_trace

topk = int(sys.argv[1]) if len(sys.argv) > 1 else 8
warp_free = 'warpfree' in sys.argv[2:]
e2e = 'e2e' in sys.argv[2:]
batch = 1
cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16,
                        'LIFT': {'TOPK': topk, 'WARP_FREE': warp_free}})
model = build_fiery(cfg)
ds = SyntheticFutureDataset(cfg, n_samples=batch, n_instances=2, seed=0)
b = ds.get_batch(list(range(batch)))
args = tuple(jnp.asarray(b[k]) for k in
             ['image', 'intrinsics', 'extrinsics', 'future_egomotion'])
variables = jax.jit(model.init, static_argnames='train')(
    {'params': jax.random.key(0)}, *args, train=False)
serve, variables = make_serving_fn(model, jax.device_get(variables), args + (None,))
variables = jax.device_put(variables)

if e2e:
    from fiery_tpu.postprocess.instance import (
        decode_instance_predictions, make_instance_id_temporally_consistent_device)

    def full(v, *a):
        output = serve(v, *a, None)
        pred_inst = decode_instance_predictions(
            {k: output[k] for k in
             ['segmentation', 'instance_center', 'instance_offset']})
        consistent = jax.vmap(make_instance_id_temporally_consistent_device)(
            pred_inst, output['instance_flow'])
        return consistent.astype(jnp.int16)
else:
    def full(v, *a):
        return serve(v, *a, None)

t0 = time.time()
fn = jax.jit(full).lower(variables, *args).compile()
print(f'compile: {time.time()-t0:.1f}s', flush=True)
trace_dir = '/tmp/trace_eval'
os.makedirs(trace_dir, exist_ok=True)
with open(os.path.join(trace_dir, 'hlo.txt'), 'w') as f:
    f.write(fn.as_text())
print('dumped optimized HLO', flush=True)

def _pull(tree):
    # real device sync: block_until_ready through the tunnel can return
    # without syncing (round-5 CLAUDE.md)
    import jax as _jax
    return float(_jax.tree_util.tree_leaves(tree)[0].ravel()[0])


out = fn(variables, *args)
_pull(out)   # also pays the one-time ~3 min d2h-channel init
t0 = time.time()
for _ in range(20):
    out = fn(variables, *args)
_pull(out)
dt = (time.time() - t0) / 20
print(f'steady {"e2e" if e2e else "fwd"}: {dt*1e3:.2f} ms  ({batch/dt:.2f} clips/s)'
      f'  topk={topk} warp_free={warp_free}', flush=True)

jax.profiler.start_trace(trace_dir)
for _ in range(3):
    out = fn(variables, *args)
_pull(out)   # real sync before stopping the trace
jax.profiler.stop_trace()

ranked, planes = summarise_trace(trace_dir, top=60)
total = sum(us for _, us in ranked)
print(f'planes: {sorted(set(planes))}')
print(f'{"us":>12}  {"%":>5}  op')
for name, us in ranked:
    print(f'{us:12.0f}  {100 * us / total:5.1f}  {name[:160]}')
