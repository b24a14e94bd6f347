"""End-to-end training tests on the synthetic dataset (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.utils.config import get_cfg


def tiny_cfg(**extra):
    overrides = {
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 2, 'BATCHSIZE': 2,
        'IMAGE': {'FINAL_DIM': (32, 48), 'NAMES': ['CAM_A', 'CAM_B']},
        'LIFT': {'X_BOUND': [-8.0, 8.0, 0.5], 'Y_BOUND': [-8.0, 8.0, 0.5],
                 'D_BOUND': [2.0, 6.0, 1.0]},
        'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 16},
                  'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 16},
                  'DISTRIBUTION': {'LATENT_DIM': 4},
                  'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1}},
    }
    overrides.update(extra)
    return get_cfg(cfg_dict=overrides)


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_cfg()
    dataset = SyntheticFutureDataset(cfg, n_samples=4, n_instances=2, seed=0)
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.get_batch([0, 1]).items()}
    state = jax.jit(trainer.init_state)(jax.random.key(0), batch)
    return cfg, dataset, trainer, batch, state


def test_synthetic_dataset_layout():
    cfg = tiny_cfg()
    ds = SyntheticFutureDataset(cfg, n_samples=2, n_instances=2, seed=0)
    sample = ds[0]
    s, n = 4, 2
    assert sample['image'].shape == (s, n, 32, 48, 3)
    assert sample['intrinsics'].shape == (s, n, 3, 3)
    assert sample['extrinsics'].shape == (s, n, 4, 4)
    assert sample['future_egomotion'].shape == (s, 6)
    assert sample['segmentation'].shape == (s, 32, 32, 1)
    assert sample['instance'].shape == (s, 32, 32)
    assert sample['centerness'].shape == (s, 32, 32, 1)
    assert sample['offset'].shape == (s, 32, 32, 2)
    assert sample['flow'].shape == (s, 32, 32, 2)
    assert sample['instance'].max() >= 1
    # offsets are ignore_index outside instances, real values inside
    inside = sample['instance'][0] > 0
    assert (sample['offset'][0][~inside] == 255).all()
    assert np.abs(sample['offset'][0][inside]).max() < 255


def test_train_step_runs_and_updates(setup):
    cfg, dataset, trainer, batch, state = setup
    train_step = jax.jit(trainer.train_step)
    new_state, metrics = train_step(state, batch, jax.random.key(1))
    assert int(new_state.step) == 1
    for key in ['segmentation', 'instance_center', 'instance_offset', 'instance_flow',
                'probabilistic', 'total_loss']:
        assert key in metrics
        assert np.isfinite(float(metrics[key])), f'{key} not finite'
    # parameters actually changed (note: some leaves legitimately keep zero grads on
    # step one — zero-init residual BN scales gate their branch — so check globally)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(state.params['model']),
                   jax.tree.leaves(new_state.params['model'])))
    assert diff > 0.0
    # batch stats updated
    bs0 = jax.tree.leaves(state.batch_stats)[0]
    bs1 = jax.tree.leaves(new_state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))


def test_loss_decreases_over_steps(setup):
    """Supervised losses must decrease when overfitting one batch. The KL term (x100)
    can transiently spike while the future distribution adjusts, so it is excluded."""
    cfg, dataset, trainer, batch, state = setup
    train_step = jax.jit(trainer.train_step)
    rng = jax.random.key(2)
    supervised = ['segmentation', 'instance_center', 'instance_offset', 'instance_flow']
    first = last = None
    for i in range(10):
        state, metrics = train_step(state, batch, rng)
        total = sum(float(metrics[k]) for k in supervised)
        if first is None:
            first = total
        last = total
    assert np.isfinite(last)
    assert last < first, f'supervised loss did not decrease: {first} -> {last}'


def test_eval_step(setup):
    cfg, dataset, trainer, batch, state = setup
    output, labels, loss_dict = jax.jit(trainer.eval_step)(state, batch)
    X = 32
    s_out = 1 + cfg.N_FUTURE_FRAMES
    assert output['segmentation'].shape == (2, s_out, X, X, 2)
    assert labels['segmentation'].shape == (2, s_out, X, X)
    assert labels['instance'].shape == (2, s_out, X, X)
    assert np.isfinite(float(sum(loss_dict.values())))
    # eval is deterministic
    output2, _, _ = jax.jit(trainer.eval_step)(state, batch)
    np.testing.assert_allclose(np.asarray(output['segmentation']),
                               np.asarray(output2['segmentation']))


def test_predict_step_without_labels(setup):
    cfg, dataset, trainer, batch, state = setup
    out = jax.jit(trainer.predict_step)(state, batch)
    assert out['future_mu'] is None  # no future labels provided
    assert out['segmentation'].shape[1] == 1 + cfg.N_FUTURE_FRAMES


def test_checkpoint_roundtrip_bit_identical_eval(setup, tmp_path):
    """save -> load -> eval must be bit-identical (SURVEY test strategy)."""
    from fiery_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    cfg, dataset, trainer, batch, state = setup
    out1, _, _ = jax.jit(trainer.eval_step)(state, batch)

    path = str(tmp_path / 'ckpt')
    save_checkpoint(path, state, cfg)
    restored, cfg2 = load_checkpoint(path)
    assert cfg2.convert_to_dict() == cfg.convert_to_dict()
    trainer2 = Trainer(cfg2)
    out2, _, _ = jax.jit(trainer2.eval_step)(restored, batch)
    np.testing.assert_array_equal(np.asarray(out1['segmentation']),
                                  np.asarray(out2['segmentation']))
    np.testing.assert_array_equal(np.asarray(out1['instance_center']),
                                  np.asarray(out2['instance_center']))


def test_optimizer_matches_torch_adam():
    """The optax chain must reproduce torch.optim.Adam with coupled L2 weight decay
    (reference trainer.py:254-260) step-for-step on a toy parameter."""
    import torch
    import optax

    lr, wd = 3e-4, 1e-2  # large wd so a decoupled-decay bug is visible
    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) * 10 for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        tp.grad = torch.tensor(g)
        torch.nn.utils.clip_grad_norm_([tp], 5.0)
        topt.step()

    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )
    jp = jnp.asarray(p0)
    opt_state = tx.init(jp)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, jp)
        jp = optax.apply_updates(jp, updates)

    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_host_label_prewarp_matches_device(setup):
    """The numpy host pre-warp (data/label_warp.py) must reproduce the device
    label warp: identical warped stack, and bit-identical train-step metrics
    when the trainer consumes the precomputed stack."""
    from fiery_tpu.data.label_warp import make_prewarp_transform
    from fiery_tpu.ops.warp import cumulative_warp_features_reverse

    cfg, dataset, trainer, batch, state = setup
    rf = trainer.receptive_field

    host = make_prewarp_transform(cfg)(
        {k: np.asarray(v) for k, v in batch.items()})
    # device twin of the same stack
    maps = [batch['segmentation'][:, rf - 1:].astype(jnp.float32),
            batch['instance'][:, rf - 1:].astype(jnp.float32)[..., None],
            batch['centerness'][:, rf - 1:],
            batch['offset'][:, rf - 1:],
            batch['flow'][:, rf - 1:]]
    ego = batch['future_egomotion'][:, rf - 1:]
    dev = cumulative_warp_features_reverse(
        jnp.concatenate(maps, axis=-1), ego, mode='nearest',
        spatial_extent=trainer.spatial_extent)
    np.testing.assert_array_equal(host['warped_label_stack'], np.asarray(dev))

    # the train step with the precomputed stack == the in-step warp path
    pre_batch = dict(batch)
    pre_batch['warped_label_stack'] = jnp.asarray(host['warped_label_stack'])
    _, m_plain = jax.jit(trainer.train_step)(state, batch, jax.random.key(1))
    _, m_pre = jax.jit(trainer.train_step)(state, pre_batch, jax.random.key(1))
    for k in m_plain:
        np.testing.assert_array_equal(np.asarray(m_plain[k]),
                                      np.asarray(m_pre[k]), err_msg=k)


def test_dataloader_prewarp_transform_wiring():
    """prepare_dataloaders attaches the prewarp transform when
    DATASET.PREWARP_LABELS is on; batches then carry 'warped_label_stack'."""
    from fiery_tpu.data.dataset import prepare_dataloaders

    cfg = tiny_cfg(DATASET={'NAME': 'synthetic', 'N_SYNTHETIC_SAMPLES': 4,
                            'PREWARP_LABELS': True})
    train_loader, _ = prepare_dataloaders(cfg)
    b = next(iter(train_loader))
    assert 'warped_label_stack' in b
    s_lab = cfg.TIME_RECEPTIVE_FIELD - 1
    n_t = b['segmentation'].shape[1] - s_lab
    assert b['warped_label_stack'].shape[:2] == (cfg.BATCHSIZE, n_t)
    assert b['warped_label_stack'].shape[-1] == 7
    assert np.isfinite(b['warped_label_stack']).all()


def test_resume_equivalence(setup, tmp_path):
    """Preemption recovery (SURVEY §5): train k steps, checkpoint, resume,
    train k more == 2k uninterrupted — params, opt_state, batch_stats all
    bit-identical. Holds because train_step folds rng with state.step
    (trainer.py:128) and the checkpoint stores the full TrainState."""
    from fiery_tpu.utils.checkpoint import (find_latest_checkpoint,
                                            load_checkpoint, save_checkpoint)
    cfg, dataset, trainer, batch, state = setup
    train_step = jax.jit(trainer.train_step)
    rng = jax.random.key(7)

    k = 2
    for _ in range(k):
        state, _ = train_step(state, batch, rng)
    run_dir = tmp_path / 'run'
    save_checkpoint(str(run_dir / f'checkpoint_epoch0'), state, cfg)

    uninterrupted = state
    for _ in range(k):
        uninterrupted, _ = train_step(uninterrupted, batch, rng)

    resolved = find_latest_checkpoint(str(run_dir))
    assert resolved == str(run_dir / 'checkpoint_epoch0')
    # state_template restores opt_state's optax NamedTuple structure —
    # without it a resumed train_step crashes on dict opt_state leaves
    resumed, cfg2 = load_checkpoint(resolved, state_template=state)
    assert int(np.asarray(resumed.step)) == k
    for _ in range(k):
        resumed, _ = train_step(resumed, batch, rng)

    assert int(np.asarray(resumed.step)) == int(np.asarray(uninterrupted.step)) == 2 * k
    for name, a, b in (
            ('params', uninterrupted.params, resumed.params),
            ('batch_stats', uninterrupted.batch_stats, resumed.batch_stats),
            ('opt_state', uninterrupted.opt_state, resumed.opt_state)):
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        assert len(leaves_a) == len(leaves_b), name
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=name)


def test_find_latest_checkpoint_resolution(setup, tmp_path):
    """Run-dir / log-dir resolution rules for --resume auto: highest complete
    epoch wins; checkpoint_final beats epochs; a partially-written checkpoint
    (state/ present, config.json missing — the async-save crash signature) is
    skipped; empty dirs resolve to None."""
    import os
    from fiery_tpu.utils.checkpoint import find_latest_checkpoint, save_checkpoint
    cfg, dataset, trainer, batch, state = setup

    assert find_latest_checkpoint(str(tmp_path / 'nope')) is None

    run = tmp_path / 'logs' / 'run_a'
    save_checkpoint(str(run / 'checkpoint_epoch0'), state, cfg)
    save_checkpoint(str(run / 'checkpoint_epoch2'), state, cfg)
    # interrupted write: state dir exists, no config.json commit marker
    partial = run / 'checkpoint_epoch3'
    os.makedirs(partial / 'state')
    assert find_latest_checkpoint(str(run)) == str(run / 'checkpoint_epoch2')

    save_checkpoint(str(run / 'checkpoint_final'), state, cfg)
    assert find_latest_checkpoint(str(run)) == str(run / 'checkpoint_final')

    # a direct checkpoint path passes through untouched
    direct = str(run / 'checkpoint_epoch0')
    assert find_latest_checkpoint(direct) == direct

    # log dir of runs: newest run holding a complete checkpoint
    assert find_latest_checkpoint(str(tmp_path / 'logs')) == str(
        run / 'checkpoint_final')
