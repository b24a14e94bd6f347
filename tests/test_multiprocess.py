"""Execute the multi-process distributed path for real: localhost processes.

Until now the multi-host branches (jax.distributed.initialize, shard_batch's
make_array_from_process_local_data, the process_allgather metric sum) had never
run with process_count > 1 anywhere. These tests spawn real CPU processes with
a localhost coordinator (tools/multiprocess_check.py), each holding its slice
of the global batch, and assert:
  * every process completes 2 jitted DP train steps over the global mesh;
  * per-step losses agree across processes (replicated out-shardings) AND with a
    single-process run of the same global batch (gradient psum + global sync-BN
    parity across the process boundary);
  * the allgather-summed IoU state equals the unsharded global metric.

Two topologies: 2 processes x 2 devices on a pure-DP 1-D mesh, and 4 processes
x 2 devices on a 2-D (data=4, model=2) mesh with the camera axis sharded over
process-local device pairs (train.py --camera-parallel) — the closest a
localhost run gets to a pod's (DCN data, ICI model) layout.
"""

import functools
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_processes(tmp_path, num_processes, local_devices, n_model=1):
    """Run tools/multiprocess_check.py across num_processes localhost processes
    with local_devices virtual CPU devices each; returns the per-process JSONs."""
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={local_devices}'
    env['GLOO_SOCKET_IFNAME'] = 'lo'  # sandboxed net: gloo must use loopback
    env.pop('JAX_PLATFORMS', None)
    outs = [str(tmp_path / f'proc{i}.json') for i in range(num_processes)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tools', 'multiprocess_check.py'),
             str(i), str(num_processes), str(port), outs[i], str(n_model)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(num_processes)]
    logs = [p.communicate(timeout=1800)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f'process {i} failed:\n{logs[i][-4000:]}'
    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    results = _spawn_processes(tmp_path, num_processes=2, local_devices=2)

    assert results[0]['n_global_devices'] == 4
    # replicated metrics agree bit-for-bit across processes
    assert results[0]['losses'] == results[1]['losses']
    assert results[0]['params_abs_sum'] == pytest.approx(
        results[1]['params_abs_sum'], rel=1e-6)
    # allgather-summed metric equals the global unsharded metric
    # (f32 metric states through the psum: ~1e-8 relative)
    np.testing.assert_allclose(results[0]['iou_allgather'],
                               results[0]['iou_global_ref'], rtol=1e-6)

    # the 2-process run must reproduce the single-process global computation.
    # f32 reduction order differs with the device partitioning (measured: 1e-5
    # rel at step 1, ~2e-4 at step 2 after one Adam update) — anything beyond
    # 1e-3 would indicate a semantic divergence (wrong psum/BN scope).
    np.testing.assert_allclose(results[0]['losses'],
                               _single_process_reference_losses(),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_four_process_2d_mesh_camera_parallel(tmp_path):
    """4 processes x 2 virtual devices, (data=4, model=2) mesh: every data row
    is a process-local device pair (camera gathers stay in-process, like
    in-slice ICI on a pod) while the gradient psum and global sync-BN span all
    4 process boundaries — then the whole thing must still reproduce the
    single-process computation."""
    results = _spawn_processes(tmp_path, num_processes=4, local_devices=2,
                               n_model=2)

    assert results[0]['n_global_devices'] == 8
    # replicated metrics agree bit-for-bit across all 4 processes
    for r in results[1:]:
        assert r['losses'] == results[0]['losses']
        assert r['params_abs_sum'] == pytest.approx(
            results[0]['params_abs_sum'], rel=1e-6)
    np.testing.assert_allclose(results[0]['iou_allgather'],
                               results[0]['iou_global_ref'], rtol=1e-6)

    # same global batch (4 = 8 devices / n_model 2) as the 2-process case, so
    # the same single-process reference applies — camera sharding must not
    # change the math (test_parallel.py proves the same for 1 process)
    np.testing.assert_allclose(results[0]['losses'],
                               _single_process_reference_losses(),
                               rtol=1e-3, atol=1e-6)


@functools.lru_cache(maxsize=1)
def _single_process_reference_losses():
    """2 train-step losses of the same global batch on one process
    (4 virtual devices, pure DP). Cached: both tests compare against the same
    global computation."""
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.parallel.mesh import create_mesh, replicated, shard_batch
    from fiery_tpu.training.trainer import Trainer
    from fiery_tpu.utils.config import get_cfg

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
    global_batch = 4
    ds = SyntheticFutureDataset(cfg, n_samples=global_batch, n_instances=2, seed=0)
    full = ds.get_batch(list(range(global_batch)))

    trainer = Trainer(cfg)
    mesh = create_mesh(4)
    repl = replicated(mesh)
    state = jax.jit(trainer.init_state)(
        jax.random.key(0), {k: jnp.asarray(v[:1]) for k, v in full.items()})
    state = jax.device_put(state, repl)
    batch = shard_batch(full, mesh)

    def step_fn(state, batch, key_data):
        return trainer.train_step(state, batch, jax.random.wrap_key_data(key_data))

    step = jax.jit(step_fn, in_shardings=(repl, None, repl),
                   out_shardings=(repl, repl))
    key_data = jax.device_put(
        np.asarray(jax.random.key_data(jax.random.key(1))), repl)
    ref_losses = []
    for _ in range(2):
        state, metrics = step(state, batch, key_data)
        ref_losses.append(float(metrics['total_loss']))
    return ref_losses
