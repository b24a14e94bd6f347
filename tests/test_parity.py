"""The accuracy-parity kit, exercised end-to-end on a synthetic 'released' ckpt.

Builds a tiny torch reference twin (tests/torch_golden.py GoldenFiery), saves it
as a Lightning-style checkpoint ({'state_dict', 'hyper_parameters'}) — the same
format as the released fiery.ckpt (reference evaluate.py:19) — then drives:
  * utils/checkpoint.load_torch_full_checkpoint: cfg rebuild from hyper_parameters
    + full weight import + runnable eval step;
  * parity._stage_diffs: per-stage activation diffs torch-twin-vs-ours must be at
    f32 noise level when both run the same checkpoint.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY = {
    'TIME_RECEPTIVE_FIELD': 3, 'N_FUTURE_FRAMES': 2, 'BATCHSIZE': 1,
    'PRECISION': 32,
    'IMAGE': {'FINAL_DIM': (64, 96), 'NAMES': ['CAM_A', 'CAM_B']},
    'LIFT': {'X_BOUND': [-8.0, 8.0, 0.5], 'Y_BOUND': [-8.0, 8.0, 0.5],
             'D_BOUND': [2.0, 8.0, 1.0]},
    'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 16},
              'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 16},
              'DISTRIBUTION': {'LATENT_DIM': 4},
              'FUTURE_PRED': {'N_GRU_BLOCKS': 2, 'N_RES_LAYERS': 2}},
}


@pytest.fixture(scope='module')
def fake_released_ckpt(tmp_path_factory):
    from torch_golden import GoldenFiery, prefixed_state_dict, randomize_bn_stats
    from torch_golden import randomize_bn3d_stats

    cfg = get_cfg(cfg_dict=TINY)
    torch.manual_seed(11)
    golden = GoldenFiery(
        C=16, D=6, final_dim=(64, 96), d_bound=(2.0, 8.0, 1.0),
        x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5),
        receptive_field=3, n_future=2, latent_dim=4, start_out_channels=16,
        n_gru_blocks=2, n_res_layers=2,
        future_in_channels=16 + 2 * 6, version='b0')
    randomize_bn_stats(golden, seed=5)
    randomize_bn3d_stats(golden.temporal_model, seed=6)
    golden.eval()
    path = str(tmp_path_factory.mktemp('ckpt') / 'fake_fiery.ckpt')
    torch.save({'state_dict': prefixed_state_dict(golden, 'model.'),
                'hyper_parameters': cfg.convert_to_dict(),
                'epoch': 19, 'global_step': 12345}, path)
    return path, cfg


def test_load_torch_full_checkpoint(fake_released_ckpt):
    from fiery_tpu.utils.checkpoint import load_torch_full_checkpoint
    path, _ = fake_released_ckpt
    state, cfg = load_torch_full_checkpoint(path)
    # cfg round-tripped from hyper_parameters
    assert cfg.MODEL.ENCODER.OUT_CHANNELS == 16
    assert tuple(cfg.IMAGE.FINAL_DIM) == (64, 96)
    # the eval graph runs with the imported weights and produces finite output
    from fiery_tpu.training.trainer import Trainer
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    trainer = Trainer(cfg)
    ds = SyntheticFutureDataset(cfg, n_samples=1, n_instances=2, seed=0)
    batch = {k: jnp.asarray(v) for k, v in ds.get_batch([0]).items()}
    output, labels, losses = jax.jit(trainer.eval_step)(state, batch)
    assert np.isfinite(np.asarray(output['segmentation'])).all()
    assert np.isfinite(float(sum(losses.values())))


def test_stage_diffs_at_noise_level(fake_released_ckpt):
    """Same ckpt through the torch twin and through our model: every stage diff
    must sit at f32 noise level — the localisation tool parity.py ships."""
    import parity
    from fiery_tpu.utils.checkpoint import load_torch_full_checkpoint
    from fiery_tpu.data.synthetic import SyntheticFutureDataset

    path, _ = fake_released_ckpt
    state, cfg = load_torch_full_checkpoint(path)
    batch = SyntheticFutureDataset(cfg, n_samples=1, n_instances=2,
                                   seed=0).get_batch([0])
    report = parity._stage_diffs(path, state, cfg, batch)
    assert set(report) >= {'bev_features', 'temporal_states', 'future_states',
                           'present_mu', 'segmentation', 'instance_center'}
    for name, (absd, rel) in report.items():
        assert np.isfinite(rel) and rel < 5e-3, (name, absd, rel)
