"""Real multi-process execution of the distributed path (localhost, CPU).

Spawned N times (by tests/test_multiprocess.py or by hand) with a localhost
coordinator, this script executes the code that single-process tests can only
simulate:

  * ``jax.distributed.initialize`` (the TPU-pod entry in train.py:84 /
    parallel/mesh.py:maybe_initialize_distributed);
  * the ``jax.make_array_from_process_local_data`` branch of
    ``parallel.mesh.shard_batch`` (each process contributes its local half of
    the global batch);
  * the jitted DP train step over the resulting global mesh (gradient psum +
    global-batch sync-BN across processes);
  * the ``multihost_utils.process_allgather`` metric-state sum of train.py's
    val loop (reference metrics.py:26-29 dist_reduce_fx='sum').

Reference equivalent: Lightning's one-DDP-process-per-GPU spawn
(/root/reference/train.py:33-45).

Usage:
  python tools/multiprocess_check.py <process_id> <num_processes> <port> <out.json> [n_model]

With ``n_model`` > 1 the mesh is 2-D (data, model) and the CAMERA axis of the
inputs is sharded over the model axis (train.py --camera-parallel): with 4
processes x 2 local devices and n_model=2, every data row of the mesh spans a
process-local device pair while the gradient psum crosses all 4 processes —
the closest a localhost run gets to a pod topology.

Each process writes JSON with per-step losses, the allgather-summed IoU, and a
params checksum; the parent asserts cross-process agreement and parity with a
single-process run of the same global batch.
"""

import json
import os
import sys


def main():
    process_id, num_processes, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    n_model = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_fiery_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.parallel.mesh import (create_mesh, replicated, shard_batch)
    from fiery_tpu.training.metrics import IntersectionOverUnion
    from fiery_tpu.training.trainer import Trainer
    from fiery_tpu.utils.config import get_cfg

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == n_local * num_processes

    cfg = get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 2, 'PRECISION': 32,
        'BATCHSIZE': 1,
        'IMAGE': {'FINAL_DIM': (32, 48), 'NAMES': ['CAM_A', 'CAM_B']},
        'LIFT': {'X_BOUND': [-8.0, 8.0, 0.5], 'Y_BOUND': [-8.0, 8.0, 0.5],
                 'D_BOUND': [2.0, 6.0, 1.0]},
        'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 16},
                  'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 16},
                  'DISTRIBUTION': {'LATENT_DIM': 4},
                  'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1}},
    })

    assert n_global % n_model == 0
    global_batch = (n_global // n_model) * cfg.BATCHSIZE
    assert global_batch % num_processes == 0, (
        'each process must own whole data-rows of the (data, model) mesh')
    ds = SyntheticFutureDataset(cfg, n_samples=global_batch, n_instances=2, seed=0)
    full = ds.get_batch(list(range(global_batch)))
    lo = process_id * (global_batch // num_processes)
    hi = lo + global_batch // num_processes
    local = {k: v[lo:hi] for k, v in full.items()}

    trainer = Trainer(cfg)
    # all global devices: 1-D 'data' mesh, or (data, model) with the camera
    # axis of the inputs sharded over process-local 'model' pairs
    mesh = create_mesh(n_model=n_model)

    # identical deterministic init on every process, then globally replicated
    state_local = jax.jit(trainer.init_state)(
        jax.random.key(0), {k: jnp.asarray(v[:1]) for k, v in full.items()})
    repl = replicated(mesh)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        jax.device_get(state_local))

    # the multi-host branch of shard_batch (make_array_from_process_local_data)
    batch = shard_batch(local, mesh)

    def step_fn(state, batch, key_data):
        return trainer.train_step(state, batch, jax.random.wrap_key_data(key_data))

    step = jax.jit(step_fn, in_shardings=(repl, None, repl), out_shardings=(repl, repl))
    key_data = jax.make_array_from_process_local_data(
        repl, np.asarray(jax.random.key_data(jax.random.key(1))))

    # Compile ahead of time on every process, then rendezvous on the
    # coordination-service barrier (gRPC) BEFORE the first collective executes:
    # the gloo rendezvous that backs CPU cross-process collectives has a fixed
    # ~30 s key-value timeout, far below the minutes of compile-time skew
    # between processes on a cold cache.
    compiled = step.lower(state, batch, key_data).compile()
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier('fiery_mp_compile', 1_800_000)

    losses = []
    for _ in range(2):
        state, metrics = compiled(state, batch, key_data)
        losses.append(float(np.asarray(
            jax.device_get(metrics['total_loss']))))

    # metric psum path: per-process local update, then allgather-summed states.
    # pred = labels rolled by 7 px so TP/FP/FN are all non-trivial and the
    # per-process IoU differs from the global one (the sum is actually tested).
    iou = IntersectionOverUnion(2)
    iou.update(np.roll(local['segmentation'][..., 0], 7, axis=-1).astype(np.int32),
               local['segmentation'][..., 0].astype(np.int32))
    summed = np.asarray(multihost_utils.process_allgather(iou.state())).sum(axis=0)
    iou.load_state(summed)
    iou_global = [float(x) for x in iou.compute()]

    # global single-host reference for the same metric, computed locally
    iou_ref = IntersectionOverUnion(2)
    iou_ref.update(np.roll(full['segmentation'][..., 0], 7, axis=-1).astype(np.int32),
                   full['segmentation'][..., 0].astype(np.int32))
    iou_ref_vals = [float(x) for x in iou_ref.compute()]

    params_sum = float(sum(
        np.abs(np.asarray(jax.device_get(x))).sum()
        for x in jax.tree.leaves(state.params)))

    with open(out_path, 'w') as f:
        json.dump({'process_id': process_id, 'losses': losses,
                   'iou_allgather': iou_global, 'iou_global_ref': iou_ref_vals,
                   'params_abs_sum': params_sum,
                   'n_global_devices': n_global}, f)
    print(f'[proc {process_id}] ok: losses={losses}')


if __name__ == '__main__':
    main()
