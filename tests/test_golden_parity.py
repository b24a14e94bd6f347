"""Golden weight-import parity: real torch state_dicts -> importer -> activations.

The torch side (tests/torch_golden.py) reproduces the reference module tree and
eval-mode numerics with the exact reference parameter names. Each test exports a
randomly-initialised state_dict (with non-trivial BN running stats), runs it
through fiery_tpu.utils.weight_import.import_torch_state_dict, and asserts the
flax module's eval activations match torch within float tolerance. Any drift in
layout transposes, module naming, padding, or eval-mode semantics fails here.

Stages covered (VERDICT round-1 item 3): encoder features (EfficientNet + FPN +
depth outer product), decoder heads, distribution (mu, log_sigma), future
prediction (GRU rollout + bottlenecks).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fiery_tpu.models.decoder import Decoder
from fiery_tpu.models.distributions import DistributionModule
from fiery_tpu.models.encoder import Encoder
from fiery_tpu.models.fiery import FieryConfig
from fiery_tpu.models.future_prediction import FuturePrediction
from fiery_tpu.utils.weight_import import import_torch_state_dict

from torch_golden import (
    GoldenDecoder,
    GoldenDistribution,
    GoldenEncoder,
    GoldenFuturePrediction,
    prefixed_state_dict,
    randomize_bn_stats,
)

C, D = 16, 6  # small encoder head for test speed


def _model_cfg(**kw):
    defaults = dict(encoder_name='efficientnet-b0', encoder_out_channels=C,
                    d_bound=(2.0, 8.0, 1.0), final_dim=(64, 96),
                    latent_dim=4, n_gru_blocks=2, n_res_layers=2,
                    start_out_channels=16)
    defaults.update(kw)
    return FieryConfig(**defaults)


def _import_subtree(state_dict, model_cfg, *path):
    out, _ = import_torch_state_dict(state_dict, model_cfg, strict=False)
    params, stats = out['params'], out['batch_stats']
    for key in path:
        params = params[key]
        stats = stats[key]
    return {'params': params, 'batch_stats': stats}


def test_encoder_golden_parity():
    torch.manual_seed(0)
    golden = randomize_bn_stats(GoldenEncoder(C, D, 'b0', 8), seed=1).eval()
    sd = prefixed_state_dict(golden, 'model.encoder.')

    x = np.random.RandomState(2).randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = golden(torch.tensor(x)).numpy()          # (B, C, D, h, w)

    variables = _import_subtree(sd, _model_cfg(), 'bev_lift', 'encoder')
    enc = Encoder(out_channels=C, depth_channels=D, version='b0', downsample=8)
    out = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out)                               # (B, h, w, D, C)
    np.testing.assert_allclose(out.transpose(0, 4, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_decoder_golden_parity():
    torch.manual_seed(3)
    in_ch = 16
    golden = randomize_bn_stats(GoldenDecoder(in_ch, n_classes=2,
                                              predict_future_flow=True),
                                seed=4).eval()
    sd = prefixed_state_dict(golden, 'model.decoder.')

    x = np.random.RandomState(5).randn(2, 3, in_ch, 40, 40).astype(np.float32)
    with torch.no_grad():
        ref = {k: (v.numpy() if v is not None else None)
               for k, v in golden(torch.tensor(x)).items()}

    variables = _import_subtree(sd, _model_cfg(), 'decoder')
    dec = Decoder(n_classes=2, predict_future_flow=True)
    out = dec.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                    train=False)
    for key in ['segmentation', 'instance_center', 'instance_offset',
                'instance_flow']:
        got = np.asarray(out[key]).transpose(0, 1, 4, 2, 3)  # back to NCHW
        np.testing.assert_allclose(got, ref[key], rtol=1e-4, atol=1e-4,
                                   err_msg=key)


@pytest.mark.parametrize('which', ['present', 'future'])
def test_distribution_golden_parity(which):
    torch.manual_seed(6)
    in_ch, latent = 16, 4
    golden = randomize_bn_stats(GoldenDistribution(in_ch, latent), seed=7).eval()
    sd = prefixed_state_dict(golden, f'model.{which}_distribution.')

    x = np.random.RandomState(8).randn(2, 1, in_ch, 32, 32).astype(np.float32)
    with torch.no_grad():
        mu_ref, ls_ref = (t.numpy() for t in golden(torch.tensor(x)))

    variables = _import_subtree(sd, _model_cfg(latent_dim=latent),
                                f'{which}_distribution')
    dist = DistributionModule(latent_dim=latent)
    mu, log_sigma = dist.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                               train=False)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(log_sigma), ls_ref, rtol=1e-4,
                               atol=1e-5)


def test_future_prediction_golden_parity():
    torch.manual_seed(9)
    in_ch, latent, n_gru, n_res = 16, 4, 2, 2
    golden = randomize_bn_stats(
        GoldenFuturePrediction(in_ch, latent, n_gru, n_res), seed=10).eval()
    sd = prefixed_state_dict(golden, 'model.future_prediction.')

    rng = np.random.RandomState(11)
    x = rng.randn(2, 3, latent, 24, 24).astype(np.float32)
    hidden = rng.randn(2, in_ch, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref = golden(torch.tensor(x), torch.tensor(hidden)).numpy()

    variables = _import_subtree(
        sd, _model_cfg(latent_dim=latent, n_gru_blocks=n_gru, n_res_layers=n_res,
                       start_out_channels=in_ch),
        'future_prediction')
    fp = FuturePrediction(in_channels=in_ch, n_gru_blocks=n_gru,
                          n_res_layers=n_res)
    out = fp.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                   jnp.asarray(hidden.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_temporal_model_golden_parity():
    """Hardest mapping: torch Conv3d weights -> 2D causally-stacked kernels."""
    from fiery_tpu.models.temporal_model import TemporalModel
    from torch_golden import GoldenTemporalModel, randomize_bn3d_stats

    torch.manual_seed(12)
    in_ch, start_out, rf = 22, 16, 3  # in_ch = encoder C (16) + 6 egopose ch
    golden = randomize_bn3d_stats(
        GoldenTemporalModel(in_ch, rf, (24, 24), start_out), seed=13).eval()
    sd = prefixed_state_dict(golden, 'model.temporal_model.')

    x = np.random.RandomState(14).randn(2, rf, in_ch, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref = golden(torch.tensor(x)).numpy()          # (b, 1, C_out, h, w)

    variables = _import_subtree(sd, _model_cfg(start_out_channels=start_out),
                                'temporal_model')
    tm = TemporalModel(receptive_field=rf, input_shape=(24, 24),
                       start_out_channels=start_out)
    out = tm.apply(variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                   train=False)
    got = np.asarray(out).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_imagenet_efficientnet_init_path(tmp_path):
    """Standalone ImageNet EfficientNet .pth (no model.encoder.backbone. prefix)
    loads into the encoder backbone via cfg.PRETRAINED machinery."""
    from fiery_tpu.training.trainer import TrainState
    from fiery_tpu.utils.checkpoint import load_pretrained_params
    from torch_golden import GoldenBackbone

    torch.manual_seed(15)
    backbone = randomize_bn_stats(GoldenBackbone('b0', 8), seed=16)
    sd = {k: v for k, v in backbone.state_dict().items()
          if not k.endswith('num_batches_tracked')}
    # a real ImageNet dict also carries head keys past the truncation point
    sd['_conv_head.weight'] = torch.zeros(1280, 320, 1, 1)
    sd['_fc.weight'] = torch.zeros(1000, 1280)
    path = str(tmp_path / 'effnet_b0.pth')
    torch.save(sd, path)

    enc = Encoder(out_channels=C, depth_channels=D, version='b0', downsample=8)
    x = jnp.zeros((1, 64, 96, 3))
    variables = enc.init({'params': jax.random.key(0)}, x, train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={'model': {'bev_lift': {'encoder': variables['params']}},
                'uncertainty': {}},
        batch_stats={'bev_lift': {'encoder': variables['batch_stats']}},
        opt_state=None)

    new_state = load_pretrained_params(path, state, model_cfg=_model_cfg())

    fpn = new_state.params['model']['bev_lift']['encoder']['EfficientNetFPN_0']
    stem = np.asarray(fpn['Conv_0']['kernel'])
    expected = sd['_conv_stem.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, expected)
    bn_mean = np.asarray(
        new_state.batch_stats['bev_lift']['encoder']['EfficientNetFPN_0']
        ['BatchNorm_0']['BatchNorm_0']['mean'])
    np.testing.assert_allclose(bn_mean, sd['_bn0.running_mean'].numpy())
    # untouched parts (depth head) keep their init
    np.testing.assert_array_equal(
        np.asarray(new_state.params['model']['bev_lift']['encoder']
                   ['depth_layer']['kernel']),
        np.asarray(variables['params']['depth_layer']['kernel']))


def test_full_graph_golden_parity():
    """END-TO-END golden parity: the composed reference graph (torch GoldenFiery:
    geometry + lift-splat + cumulative warp + egopose concat + temporal + CVAE +
    GRU rollout + decoder, eval mode) vs our full Fiery module loaded from the
    SAME torch state dict through the weight importer. This is the closest
    in-environment approximation of running a released reference checkpoint
    through both implementations (reference fiery.py:130-191)."""
    import torch as _torch
    from torch_golden import GoldenFiery, randomize_bn_stats, prefixed_state_dict
    from fiery_tpu.models.fiery import Fiery

    _torch.manual_seed(42)
    n_future, rf, latent, start_out = 2, 3, 4, 16
    fdi_ch = 6
    golden = GoldenFiery(C=C, D=6, final_dim=(64, 96), d_bound=(2.0, 8.0, 1.0),
                         receptive_field=rf, n_future=n_future, latent_dim=latent,
                         start_out_channels=start_out,
                         future_in_channels=start_out + n_future * fdi_ch)
    randomize_bn_stats(golden, seed=3)
    from torch_golden import randomize_bn3d_stats
    randomize_bn3d_stats(golden.temporal_model, seed=4)
    golden.eval()
    sd = prefixed_state_dict(golden, 'model.')

    cfg = _model_cfg(time_receptive_field=rf, n_future_frames=n_future,
                     x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5))

    rng = np.random.RandomState(0)
    b, s, n = 1, rf + n_future, 2
    H, W = 64, 96
    image = rng.rand(b, s, n, 3, H, W).astype(np.float32)
    K = np.array([[40.0, 0, 48], [0, 40.0, 32], [0, 0, 1]], np.float32)
    intr = np.broadcast_to(K, (b, s, n, 3, 3)).copy()
    # two cameras: one forward, one slightly rotated + shifted
    E0 = np.eye(4, dtype=np.float32)
    th = 0.4
    E1 = np.array([[np.cos(th), -np.sin(th), 0, 0.5],
                   [np.sin(th), np.cos(th), 0, -0.3],
                   [0, 0, 1, 0.2], [0, 0, 0, 1]], np.float32)
    extr = np.stack([np.stack([E0, E1]) for _ in range(s)])[None]
    ego = (rng.randn(b, s, 6) * 0.05).astype(np.float32)
    fdi = rng.rand(b, 1 + n_future, fdi_ch, 32, 32).astype(np.float32)
    noise = rng.randn(b, 1, latent).astype(np.float32)

    with _torch.no_grad():
        ref = golden(_torch.tensor(image), _torch.tensor(intr),
                     _torch.tensor(extr), _torch.tensor(ego),
                     _torch.tensor(fdi), _torch.tensor(noise))

    out_full, _ = import_torch_state_dict(sd, cfg, strict=False)
    variables = {'params': out_full['params'], 'batch_stats': out_full['batch_stats']}
    model = Fiery(cfg=cfg)
    out = model.apply(
        variables,
        jnp.asarray(image.transpose(0, 1, 2, 4, 5, 3)),     # NHWC images
        jnp.asarray(intr), jnp.asarray(extr), jnp.asarray(ego),
        jnp.asarray(fdi.transpose(0, 1, 3, 4, 2)),          # channels-last labels
        jnp.asarray(noise), train=False)

    for key in ['present_mu', 'present_log_sigma', 'future_mu', 'future_log_sigma']:
        np.testing.assert_allclose(np.asarray(out[key]), ref[key].numpy(),
                                   rtol=1e-3, atol=1e-4, err_msg=key)
    for key in ['segmentation', 'instance_center', 'instance_offset',
                'instance_flow']:
        got = np.asarray(out[key]).transpose(0, 1, 4, 2, 3)  # back to NCHW
        np.testing.assert_allclose(got, ref[key].numpy(), rtol=1e-3, atol=1e-3,
                                   err_msg=key)


@pytest.mark.slow
def test_encoder_b4_golden_parity():
    """EfficientNet-b4 — the baseline encoder (reference encoder.py:16,
    config.py:79) — golden parity at reduced spatial size: width 1.4 / depth 1.8
    scaled block specs, truncation at downsample-8 (index 21 -> 22 blocks,
    reference encoder.py:40-56), per-block drop-connect schedule params, and the
    160+56-channel FPN concat. Pins the importer for b4, not just b0."""
    from fiery_tpu.models.efficientnet import block_specs, truncation_index

    # structural pins for the width/depth scaling and truncation
    assert truncation_index('b4', 8) == 21
    specs = block_specs('b4')
    assert len(specs) >= 22
    # spec tuple: (kernel, stride, expand, in_ch, out_ch, se_ratio)
    assert specs[0][3] == 48 and specs[0][4] == 24      # stem 32*1.4 -> 48
    assert specs[21][4] == 160                          # stride-16 stage width

    torch.manual_seed(4)
    golden = randomize_bn_stats(GoldenEncoder(C, D, 'b4', 8), seed=5).eval()
    assert len(golden.backbone._blocks) == 22
    sd = prefixed_state_dict(golden, 'model.encoder.')

    x = np.random.RandomState(6).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = golden(torch.tensor(x)).numpy()

    cfg = _model_cfg(encoder_name='efficientnet-b4')
    variables = _import_subtree(sd, cfg, 'bev_lift', 'encoder')
    enc = Encoder(out_channels=C, depth_channels=D, version='b4', downsample=8)
    out = np.asarray(enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               train=False))
    np.testing.assert_allclose(out.transpose(0, 4, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)
