"""Device mesh + sharding helpers (data parallel, optional camera/model axis).

The reference's distributed story is DDP + sync-BN + fp16 via Lightning
(/root/reference/train.py:33-45). TPU-native equivalent: a 1-D ``data`` mesh;
the train step is jit-compiled with the batch sharded over that axis and the state
replicated. GSPMD then emits the gradient all-reduce (psum) and computes BatchNorm
statistics over the global batch (sync-BN) — no hand-written collectives.
Scale-out to multi-slice happens by letting the data axis span DCN; in-slice
collectives ride ICI automatically.

Beyond the reference: an optional second ``model`` mesh axis shards the CAMERA
dimension of the per-frame inputs (images / intrinsics / extrinsics). The encoder
— by far the largest activation footprint (54 camera-frames of 224x480 EfficientNet
at baseline) — then runs on 1/n_model of the cameras per device, and GSPMD inserts
the gather where the voxel splat combines all cameras of a sample into one BEV
grid. FIERY has no weight axis worth sharding (~20M params), so camera parallelism
is the natural second axis for this architecture: it cuts per-chip activation
memory without touching any model code.
"""

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# batch keys carrying a per-camera axis at dim 2: (b, s, n_cam, ...)
_CAMERA_KEYS = ('image', 'intrinsics', 'extrinsics')

# ---------------------------------------------------------------------------
# BEV spatial partitioning (the post-splat half of the network)
#
# Camera parallelism splits the ENCODER over the model axis, but everything
# after the voxel splat — temporal stack, GRU rollout, decoder — is a dense
# (b, t, X, Y, C) conv pipeline that GSPMD would otherwise run replicated on
# the model axis. With BEV sharding enabled, the model forward applies
# with_sharding_constraint at its module boundaries putting the BEV X axis
# (dim -3) on the same 'model' axis: XLA's spatial partitioner inserts the
# 1-2 row halo exchanges 3x3 convs need (pure ICI traffic), and per-chip BEV
# activation memory drops by n_model. The constraint context is read at TRACE
# time (jit caches by function identity — make_parallel_train_step builds a
# fresh closure per call, so flipping the flag always retraces).
# ---------------------------------------------------------------------------

_BEV_CTX = None  # (mesh, data_axis_name, model_axis_name) when enabled


@contextlib.contextmanager
def bev_sharding(mesh: Mesh, axis_name: str = 'data',
                 model_axis_name: str = 'model'):
    """Enable BEV spatial-partitioning constraints while tracing under this mesh."""
    global _BEV_CTX
    prev = _BEV_CTX
    _BEV_CTX = (mesh, axis_name, model_axis_name)
    try:
        yield
    finally:
        _BEV_CTX = prev


def bev_constraint(x):
    """Constrain a BEV activation: batch on 'data', the X row axis (dim -3) on
    'model'. Identity when BEV sharding is not enabled (the default) or for
    tensors without a spatial plane."""
    ctx = _BEV_CTX
    if ctx is None or x is None or getattr(x, 'ndim', 0) < 4:
        return x
    mesh, data_axis, model_axis = ctx
    spec = [None] * x.ndim
    spec[0] = data_axis
    spec[x.ndim - 3] = model_axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def create_mesh(n_devices: Optional[int] = None, axis_name: str = 'data',
                n_model: int = 1, model_axis_name: str = 'model') -> Mesh:
    """1-D data mesh, or a (data, model) 2-D mesh when n_model > 1.

    The model axis is the minor (fast) axis so it maps to adjacent devices —
    camera gathers ride the shortest ICI hops; gradient psums span the data axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_model <= 1:
        return Mesh(np.asarray(devices[:n_devices]), (axis_name,))
    if n_devices % n_model:
        raise ValueError(f'n_devices {n_devices} not divisible by n_model {n_model}')
    grid = np.asarray(devices[:n_devices]).reshape(n_devices // n_model, n_model)
    return Mesh(grid, (axis_name, model_axis_name))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def batch_shardings(batch, mesh: Mesh, axis_name: str = 'data',
                    model_axis_name: str = 'model'):
    """Per-leaf shardings: batch axis on ``data``; on a 2-D mesh, the camera axis
    (dim 2 of image/intrinsics/extrinsics) additionally on ``model``."""
    data = NamedSharding(mesh, P(axis_name))
    if model_axis_name not in mesh.axis_names:
        return {k: data for k in batch}
    cam = NamedSharding(mesh, P(axis_name, None, model_axis_name))
    return {k: cam if k in _CAMERA_KEYS else data for k in batch}


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """Device-put a host batch with the leading axis sharded over the mesh.

    Multi-host: each process passes its LOCAL shard (global_batch / process_count
    samples); the shards assemble into one global array per leaf
    (jax.make_array_from_process_local_data), so the jitted step sees the same
    global batch it would single-host. Single-process: plain sharded device_put.
    """
    shardings = batch_shardings(batch, mesh, axis_name)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(shardings[k],
                                                          np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


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
                             donate_state: bool = False,
                             bev_parallel: bool = False):
    """jit the trainer's train_step with batch sharded on the data axis.

    State and rng are replicated; XLA inserts psum for gradients and global batch
    statistics for BN (reference sync_batchnorm parity, train.py:37).
    donate_state=True donates the input TrainState buffers (params + optimizer state,
    ~1 GB at baseline scale) so XLA updates them in place — only safe when the caller
    rebinds ``state = step(state, ...)`` and never reuses the old state.
    bev_parallel=True additionally spatially partitions the post-splat BEV
    pipeline over the 'model' axis (see bev_sharding above); requires a 2-D mesh.
    """
    repl = replicated(mesh)
    if bev_parallel and 'model' not in mesh.axis_names:
        raise ValueError('bev_parallel requires a (data, model) 2-D mesh')

    def step(state, batch, rng):
        if bev_parallel:
            with bev_sharding(mesh, axis_name):
                return trainer.train_step(state, batch, rng)
        return trainer.train_step(state, batch, rng)

    # batch shardings are taken from the arrays themselves (shard_batch puts the
    # batch axis on 'data' and, on a 2-D mesh, the camera axis on 'model')
    return jax.jit(
        step,
        in_shardings=(repl, None, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_parallel_eval_step(trainer, mesh: Mesh, axis_name: str = 'data',
                            bev_parallel: bool = False):
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    if bev_parallel and 'model' not in mesh.axis_names:
        raise ValueError('bev_parallel requires a (data, model) 2-D mesh')

    def step(state, batch):
        if bev_parallel:
            with bev_sharding(mesh, axis_name):
                return trainer.eval_step(state, batch)
        return trainer.eval_step(state, batch)

    return jax.jit(
        step,
        in_shardings=(repl, None),
        out_shardings=(data, data, repl),
    )
