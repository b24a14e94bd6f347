"""Device mesh + data-parallel sharding helpers.

The reference's distributed story is DDP + sync-BN + fp16 via Lightning
(/root/reference/train.py:33-45). TPU-native equivalent: a 1-D ``data`` mesh;
the train step is jit-compiled with the batch sharded over that axis and the state
replicated. GSPMD then emits the gradient all-reduce (psum) and computes BatchNorm
statistics over the global batch (sync-BN) — no hand-written collectives.
Scale-out to multi-slice happens by letting the data axis span DCN; in-slice
collectives ride ICI automatically.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Device-put a host batch with the leading axis sharded over the mesh.

    Multi-host: each process passes its LOCAL shard (global_batch / process_count
    samples); the shards assemble into one global array per leaf
    (jax.make_array_from_process_local_data), so the jitted step sees the same
    global batch it would single-host. Single-process: plain sharded device_put.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def maybe_initialize_distributed():
    """jax.distributed.initialize() when cluster env vars are present.

    The reference's equivalent is Lightning spawning one DDP process per GPU
    (train.py:33-45); on TPU pods each host process joins the global runtime here.
    No-op for single-process runs (the common case in tests/benchmarks).
    """
    import os
    if jax.process_count() > 1:
        return  # already initialized
    cluster_vars = ('COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS',
                    'MEGASCALE_COORDINATOR_ADDRESS')
    if any(v in os.environ for v in cluster_vars):
        jax.distributed.initialize()


def make_parallel_train_step(trainer, mesh: Mesh, axis_name: str = 'data',
                             donate_state: bool = False):
    """jit the trainer's train_step with batch sharded on the data axis.

    State and rng are replicated; XLA inserts psum for gradients and global batch
    statistics for BN (reference sync_batchnorm parity, train.py:37).
    donate_state=True donates the input TrainState buffers (params + optimizer state,
    ~1 GB at baseline scale) so XLA updates them in place — only safe when the caller
    rebinds ``state = step(state, ...)`` and never reuses the old state.
    """
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    return jax.jit(
        trainer.train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_parallel_eval_step(trainer, mesh: Mesh, axis_name: str = 'data'):
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    return jax.jit(
        trainer.eval_step,
        in_shardings=(repl, data),
        out_shardings=(data, data, repl),
    )
