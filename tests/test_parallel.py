"""Distributed tests on the virtual 8-device CPU mesh.

Asserts the core DP invariants the reference gets from Lightning DDP + sync-BN
(train.py:34-43): a data-parallel-sharded step equals the single-device step, and
BatchNorm uses global-batch statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from fiery_tpu.parallel.mesh import (
    create_mesh, make_parallel_train_step, shard_batch,
)
from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.utils.config import get_cfg


def tiny_cfg():
    return get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 1, 'BATCHSIZE': 8,
        'IMAGE': {'FINAL_DIM': (16, 32), 'NAMES': ['CAM_A']},
        'LIFT': {'X_BOUND': [-4.0, 4.0, 0.5], 'Y_BOUND': [-4.0, 4.0, 0.5],
                 'D_BOUND': [2.0, 4.0, 1.0]},
        'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 8},
                  'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 8, 'PYRAMID_POOLING': False},
                  'DISTRIBUTION': {'LATENT_DIM': 2},
                  'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1}},
    })


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_sync_batchnorm_global_statistics():
    """BN under jit+sharding must normalise with global-batch stats, matching the
    unsharded computation exactly (sync-BN)."""
    mesh = create_mesh()

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)

    m = M()
    rng = np.random.RandomState(0)
    # deliberately non-identically-distributed shards
    x = np.concatenate([rng.randn(4, 6).astype(np.float32) * (i + 1) + i
                        for i in range(8)])
    variables = m.init(jax.random.key(0), jnp.asarray(x))

    ref, ref_stats = m.apply(variables, jnp.asarray(x), mutable=['batch_stats'])

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P('data')))
    f = jax.jit(lambda v, x: m.apply(v, x, mutable=['batch_stats']),
                in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P('data'))))
    out, stats = f(variables, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(stats)[0]),
        np.asarray(jax.tree.leaves(ref_stats)[0]), atol=1e-6)


def test_dp_step_matches_single_device():
    """One DP-sharded train step == one unsharded train step (same batch)."""
    cfg = tiny_cfg()
    dataset = SyntheticFutureDataset(cfg, n_samples=8, n_instances=1, seed=0)
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.get_batch(list(range(8))).items()}

    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)
    single_state, single_metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.key(1))

    mesh = create_mesh()
    pstep = make_parallel_train_step(trainer, mesh)
    sharded_batch = shard_batch(batch, mesh)
    dp_state, dp_metrics = pstep(state, sharded_batch, jax.random.key(1))

    # remat replays the lift with different fusion; the (synthetic, KL-dominated) loss
    # is ~1e7 so fp noise shows up at ~1e-3 relative
    np.testing.assert_allclose(float(dp_metrics['total_loss']),
                               float(single_metrics['total_loss']), rtol=5e-3)
    # BN running stats must match the global-batch statistics (sync-BN); tolerance is
    # relative because f32 reduction-order noise compounds through ~30 stacked BNs.
    # (test_sync_batchnorm_global_statistics pins a single BN to 1e-6 with non-iid
    # shards, which is the sharp collective-behaviour check.)
    for a, b in zip(jax.tree.leaves(single_state.batch_stats),
                    jax.tree.leaves(dp_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4)
    # post-Adam params: the first-step update is ~±lr (m/sqrt(v) ~ sign(g)), so fp
    # reduction-order noise in tiny grads can flip it; allow 2*lr slack
    lr = cfg.OPTIMIZER.LR
    for a, b in zip(jax.tree.leaves(single_state.params),
                    jax.tree.leaves(dp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


def test_camera_model_axis_matches_single_device():
    """(data=4, model=2) mesh with the CAMERA axis sharded over 'model' == the
    unsharded step (camera parallelism splits encoder work; GSPMD gathers at the
    splat). This is the beyond-reference second mesh axis — FIERY has no weight
    dimension worth sharding, cameras are the natural one."""
    cfg = tiny_cfg()
    cfg.defrost()
    cfg.IMAGE.NAMES = ['CAM_A', 'CAM_B']  # one camera per model-axis device
    cfg.freeze()
    dataset = SyntheticFutureDataset(cfg, n_samples=8, n_instances=1, seed=0)
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.get_batch(list(range(8))).items()}

    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)
    single_state, single_metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.key(1))

    mesh = create_mesh(n_model=2)
    assert mesh.devices.shape == (4, 2)
    pstep = make_parallel_train_step(trainer, mesh)
    sharded = shard_batch(batch, mesh)
    # the camera axis really is sharded over 'model'
    assert 'model' in str(sharded['image'].sharding.spec)
    mp_state, mp_metrics = pstep(state, sharded, jax.random.key(1))

    np.testing.assert_allclose(float(mp_metrics['total_loss']),
                               float(single_metrics['total_loss']), rtol=5e-3)
    lr = cfg.OPTIMIZER.LR
    for a, b in zip(jax.tree.leaves(single_state.params),
                    jax.tree.leaves(mp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


def test_bev_constraint_shards_spatially():
    """bev_constraint under bev_sharding really puts the X row axis on 'model'
    (and is the identity outside the context)."""
    from fiery_tpu.parallel.mesh import bev_sharding, bev_constraint

    mesh = create_mesh(n_model=2)
    x = jnp.zeros((4, 2, 16, 16, 8))

    def constrained(x):
        with bev_sharding(mesh):
            return bev_constraint(x)

    out = jax.jit(constrained)(x)
    spec = out.sharding.spec
    assert spec[0] == 'data' and spec[2] == 'model', spec

    # rank-4 hidden states: model lands on the X axis (dim 1)
    out4 = jax.jit(constrained)(jnp.zeros((4, 16, 16, 8)))
    spec4 = out4.sharding.spec
    assert spec4[0] == 'data' and spec4[1] == 'model', spec4

    # identity outside the context: no 'model' axis appears
    plain = jax.jit(lambda t: bev_constraint(t))(x)
    assert 'model' not in str(plain.sharding)


def test_bev_spatial_axis_matches_single_device():
    """(data=4, model=2) mesh with the camera axis sharded AND the post-splat
    BEV pipeline spatially partitioned over 'model' == the unsharded step.
    GSPMD inserts the conv halo exchanges; math must be unchanged."""
    cfg = tiny_cfg()
    cfg.defrost()
    cfg.IMAGE.NAMES = ['CAM_A', 'CAM_B']
    cfg.freeze()
    dataset = SyntheticFutureDataset(cfg, n_samples=8, n_instances=1, seed=0)
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.get_batch(list(range(8))).items()}

    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)
    single_state, single_metrics = jax.jit(trainer.train_step)(
        state, batch, jax.random.key(1))

    mesh = create_mesh(n_model=2)
    pstep = make_parallel_train_step(trainer, mesh, bev_parallel=True)
    sharded = shard_batch(batch, mesh)
    sp_state, sp_metrics = pstep(state, sharded, jax.random.key(1))

    np.testing.assert_allclose(float(sp_metrics['total_loss']),
                               float(single_metrics['total_loss']), rtol=5e-3)
    lr = cfg.OPTIMIZER.LR
    for a, b in zip(jax.tree.leaves(single_state.params),
                    jax.tree.leaves(sp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


def test_dp_gradients_match_single_device():
    """Raw gradients (before Adam) of the DP-sharded loss == unsharded gradients.

    Pins the gradient all-reduce far tighter than the post-optimizer params above
    (Adam's sign-like first step amplifies fp noise; the grads themselves only see
    reduction-order noise)."""
    cfg = tiny_cfg()
    cfg.defrost()
    cfg.PRECISION = 32  # isolate collective semantics from bf16 compute noise
    cfg.freeze()
    dataset = SyntheticFutureDataset(cfg, n_samples=8, n_instances=1, seed=0)
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.get_batch(list(range(8))).items()}
    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)

    def grads_fn(state, batch, rng):
        labels, fdi = trainer.prepare_future_labels(batch)
        rngs = {'sample': rng, 'dropout': jax.random.fold_in(rng, 1)}

        def loss_fn(params):
            variables = {'params': params['model'], 'batch_stats': state.batch_stats}
            output, _ = trainer.model.apply(
                variables, batch['image'], batch['intrinsics'], batch['extrinsics'],
                batch['future_egomotion'], fdi, train=True,
                rngs=rngs, mutable=['batch_stats'])
            from fiery_tpu.training.losses import compute_losses
            return sum(compute_losses(output, labels, params['uncertainty'],
                                      trainer.cfg).values())

        return jax.grad(loss_fn)(state.params)

    rng = jax.random.key(1)
    g_single = jax.jit(grads_fn)(state, batch, rng)

    mesh = create_mesh()
    repl = NamedSharding(mesh, P())
    g_dp = jax.jit(grads_fn, in_shardings=(repl, None, repl),
                   out_shardings=repl)(state, shard_batch(batch, mesh), rng)

    # Normalise diffs by the GLOBAL max gradient magnitude: per-leaf or per-element
    # relative metrics blow up on near-zero elements (post-BN bias grads and means
    # are cancellation residue ~1e-8 of the global scale; measured noise there
    # reaches 2x of the tiny leaf max). A structural DP bug — missing psum, wrong
    # shard — shifts whole leaves by O(1) of the global scale; measured noise floor
    # for this model is <1e-4.
    gmax = max(float(np.max(np.abs(np.asarray(leaf))))
               for leaf in jax.tree.leaves(g_single))
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g_single)[0],
                            jax.tree.leaves(g_dp)):
        a, b = np.asarray(a), np.asarray(b)
        worst = float(np.max(np.abs(a - b))) / gmax
        assert worst < 1e-3, f'{jax.tree_util.keystr(path)}: {worst}'


def test_metric_state_psum_equals_unsharded():
    """Sharded metric accumulation + psum == unsharded accumulation (the reference
    relies on Lightning dist_reduce_fx='sum', metrics.py:26-29)."""
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from fiery_tpu.training.metrics import iou_update_jnp

    mesh = create_mesh()
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)
    tgt = rng.randint(0, 2, (8, 16, 16)).astype(np.int32)

    @partial(shard_map, mesh=mesh, in_specs=(P('data'), P('data')),
             out_specs=P())
    def sharded_state(p, t):
        return jax.lax.psum(iou_update_jnp(p, t, 2), 'data')

    full = np.asarray(iou_update_jnp(jnp.asarray(pred), jnp.asarray(tgt), 2))
    summed = np.asarray(sharded_state(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_array_equal(summed, full)

    # GSPMD path: jit over the sharded batch must produce the same global state
    data = NamedSharding(mesh, P('data'))
    jit_state = jax.jit(lambda p, t: iou_update_jnp(p, t, 2),
                        in_shardings=(data, data))
    np.testing.assert_array_equal(np.asarray(jit_state(pred, tgt)), full)

    # and loading the summed state into the host metric gives identical scores
    from fiery_tpu.training.metrics import IntersectionOverUnion
    host = IntersectionOverUnion(2)
    host.update(pred, tgt)
    via_device = IntersectionOverUnion(2)
    via_device.load_state(summed)
    np.testing.assert_allclose(via_device.compute(), host.compute())


def test_multihost_loader_sharding_deterministic():
    """Per-process loader shards are disjoint, cover the epoch, and are
    deterministic across re-iteration (multi-host input pipeline invariants)."""
    from fiery_tpu.data.dataset import DataLoader

    class Indices:
        def __len__(self):
            return 32
        def __getitem__(self, i):
            return {'idx': np.asarray([i])}

    def epoch(loader):
        return [b['idx'][:, 0] for b in loader]

    shards = [DataLoader(Indices(), 4, shuffle=True, drop_last=True, seed=3,
                         process_index=p, process_count=2) for p in range(2)]
    shard_batches = [epoch(s) for s in shards]

    seen = np.concatenate([np.concatenate(sb) for sb in shard_batches])
    assert len(set(seen.tolist())) == 32  # disjoint + full coverage

    # per-host shards are deterministic across re-iteration of the same epoch
    shards2 = [DataLoader(Indices(), 4, shuffle=True, drop_last=True, seed=3,
                          process_index=p, process_count=2) for p in range(2)]
    for a, b in zip(shard_batches, [epoch(s) for s in shards2]):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
