"""Module/shape tests for the NN stack at reduced-but-representative shapes.

Contract shapes follow the reference docstrings (e.g. fiery.py:288-303, data.py:346-367)
scaled down; channel counts for the EfficientNet FPN endpoints are pinned to the
reference constants (encoder.py:19-30).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiery_tpu.models.decoder import Decoder
from fiery_tpu.models.distributions import DistributionModule
from fiery_tpu.models.efficientnet import (
    EfficientNetFPN, block_specs, truncation_index, round_filters,
)
from fiery_tpu.models.encoder import Encoder
from fiery_tpu.models.fiery import Fiery, FieryConfig
from fiery_tpu.models.layers import Bottleneck, ConvBlock, UpsamplingAdd, UpsamplingConcat
from fiery_tpu.models.temporal_layers import (
    Bottleneck3D, PyramidSpatioTemporalPooling, SpatialGRU, TemporalBlock,
    causal_max_pool3d,
)
from fiery_tpu.models.temporal_model import TemporalModel, TemporalModelIdentity


def init_and_apply(module, *args, train=False, method=None, **kwargs):
    rngs = {'params': jax.random.key(0), 'sample': jax.random.key(1),
            'dropout': jax.random.key(2)}
    variables = module.init(rngs, *args, train=train, **kwargs)
    out = module.apply(variables, *args, train=train,
                       rngs={'sample': jax.random.key(3), 'dropout': jax.random.key(4)},
                       mutable=['batch_stats'], **kwargs)
    return out[0], variables


def test_efficientnet_block_structure():
    # b0: 16 blocks total, truncate at 10 for downsample 8 (reference encoder.py:44)
    assert len(block_specs('b0')) == 16
    assert truncation_index('b0', 8) == 10
    # b4: 32 blocks, truncate at 21 (reference encoder.py:46)
    assert len(block_specs('b4')) == 32
    assert truncation_index('b4', 8) == 21
    # width scaling parity with efficientnet-pytorch round_filters
    assert round_filters(32, 1.4) == 48
    assert round_filters(40, 1.4) == 56
    assert round_filters(112, 1.4) == 160


@pytest.mark.parametrize('version,ch_hi,ch_lo', [('b0', 112, 40), ('b4', 160, 56)])
def test_efficientnet_fpn_endpoints(version, ch_hi, ch_lo):
    """Endpoint channels must match the reference UpsamplingConcat input maths
    (encoder.py:25-30): b0 -> 112+40, b4 -> 160+56 at downsample 8."""
    model = EfficientNetFPN(version=version, downsample=8)
    x = jnp.ones((1, 64, 96, 3))
    (hi, lo), _ = init_and_apply(model, x)
    assert hi.shape == (1, 4, 6, ch_hi)    # stride 16
    assert lo.shape == (1, 8, 12, ch_lo)   # stride 8


def test_encoder_output_shape():
    enc = Encoder(out_channels=24, depth_channels=6, version='b0')
    x = jnp.ones((2, 64, 96, 3))
    out, _ = init_and_apply(enc, x)
    assert out.shape == (2, 8, 12, 6, 24)
    # depth distribution: summing over D recovers the feature map scaled by sum(softmax)=1
    assert bool(jnp.all(jnp.isfinite(out)))


def test_conv_block_and_bottleneck_shapes():
    x = jnp.ones((2, 16, 16, 8))
    out, _ = init_and_apply(ConvBlock(out_channels=12), x)
    assert out.shape == (2, 16, 16, 12)
    out, _ = init_and_apply(Bottleneck(out_channels=8), x)
    assert out.shape == (2, 16, 16, 8)
    out, _ = init_and_apply(Bottleneck(out_channels=12, downsample=True), x)
    assert out.shape == (2, 8, 8, 12)
    out, _ = init_and_apply(Bottleneck(out_channels=12, upsample=True), x)
    assert out.shape == (2, 32, 32, 12)
    # odd input size under downsampling (reference convolutions.py:165-167)
    x_odd = jnp.ones((2, 15, 17, 8))
    out, _ = init_and_apply(Bottleneck(out_channels=12, downsample=True), x_odd)
    assert out.shape == (2, 8, 9, 12)


def test_upsampling_layers():
    x = jnp.ones((2, 8, 8, 16))
    skip = jnp.ones((2, 16, 16, 6))
    out, _ = init_and_apply(UpsamplingConcat(out_channels=10), x, skip)
    assert out.shape == (2, 16, 16, 10)
    skip2 = jnp.ones((2, 16, 16, 4))
    out, _ = init_and_apply(UpsamplingAdd(out_channels=4), x, skip2)
    assert out.shape == (2, 16, 16, 4)


def test_causal_max_pool():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 8, 8, 2).astype(np.float32))
    out = causal_max_pool3d(x, (2, 3, 3))
    assert out.shape == x.shape
    # causality: output at t=0 must not depend on t>0
    x2 = x.at[:, 1:].set(100.0)
    out2 = causal_max_pool3d(x2, (2, 3, 3))
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out2[:, 0]))


def test_temporal_block_causality():
    """A temporal block output at frame t must be independent of frames > t."""
    model = TemporalBlock(out_channels=8, use_pyramid_pooling=True, pool_sizes=[(2, 8, 8)])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3, 8, 8, 8).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)
    out1 = model.apply(variables, x)
    x2 = x.at[:, 2].set(7.0)
    out2 = model.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(out1[:, :2]), np.asarray(out2[:, :2]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 2]), np.asarray(out2[:, 2]))


def test_pyramid_pooling_shapes_and_causality():
    model = PyramidSpatioTemporalPooling(reduction_channels=4, pool_sizes=[(2, 8, 8)])
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 8, 8, 6).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 3, 8, 8, 4)
    x2 = x.at[:, 2].set(9.0)
    out2 = model.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(out2[:, :2]), atol=1e-5)


def test_spatial_gru():
    model = SpatialGRU(hidden_size=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8, 8, 5).astype(np.float32))
    out, _ = init_and_apply(model, x)
    assert out.shape == (2, 4, 8, 8, 8)
    # with explicit initial state
    state = jnp.zeros((2, 8, 8, 8))
    out2, _ = init_and_apply(model, x, state)
    assert out2.shape == (2, 4, 8, 8, 8)


def test_temporal_model_identity():
    model = TemporalModelIdentity(receptive_field=3)
    x = jnp.ones((2, 5, 8, 8, 4))
    assert model(x).shape == (2, 3, 8, 8, 4)


def test_temporal_model_shapes():
    model = TemporalModel(receptive_field=3, input_shape=(8, 8), start_out_channels=16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 8, 8, 10).astype(np.float32))
    out, _ = init_and_apply(model, x)
    assert out.shape == (1, 1, 8, 8, 16)


@pytest.mark.parametrize('extra,inbetween,pyramid', [(0, 0, True), (4, 1, True),
                                                     (0, 0, False)])
def test_temporal_model_trim_exact_at_eval(extra, inbetween, pyramid):
    """Causal trimming (drop_front) must be bit-for-bit the full eval computation.

    Covers the pyramid-pooling path, the channel-changing skip projection
    (extra_in_channels>0 makes out_channels != in_channels), and in-between
    spatial Bottleneck3Ds. Non-trivial BN running stats come from one
    batch-stats-mutating train apply first.
    """
    model = TemporalModel(receptive_field=4, input_shape=(8, 8),
                          start_out_channels=16, extra_in_channels=extra,
                          n_spatial_layers_between_temporal_layers=inbetween,
                          use_pyramid_pooling=pyramid)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 8, 8, 12).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x, train=True)
    _, mutated = model.apply(variables, x, train=True, mutable=['batch_stats'])
    variables = {**variables, **mutated}
    full = model.apply(variables, x, train=False)
    trimmed = model.apply(variables, x, train=False, trim=True)
    assert full.shape == trimmed.shape == (2, 1, 8, 8, 16 + 2 * extra)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(trimmed))


def test_temporal_model_trim_train_mode_runs():
    """TRIM_TRAIN path: train-mode trimming computes BN batch stats over the kept
    frames only (approximate — off parity); it must run, mutate batch_stats, and
    keep the output finite at the trimmed shape."""
    model = TemporalModel(receptive_field=3, input_shape=(8, 8), start_out_channels=16)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 3, 8, 8, 12).astype(np.float32))
    variables = model.init({'params': jax.random.key(0)}, x, train=True)
    out, mutated = model.apply(variables, x, train=True, trim=True,
                               mutable=['batch_stats'])
    assert out.shape == (2, 1, 8, 8, 16)
    assert bool(jnp.isfinite(out).all())
    leaves = jax.tree.leaves(mutated['batch_stats'])
    assert leaves and any(bool(jnp.abs(l).sum() > 0) for l in leaves)


def test_distribution_module():
    model = DistributionModule(latent_dim=8, min_log_sigma=-5.0, max_log_sigma=5.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 32, 32, 16).astype(np.float32))
    (mu, log_sigma), _ = init_and_apply(model, x)
    assert mu.shape == (2, 1, 8)
    assert log_sigma.shape == (2, 1, 8)
    assert bool(jnp.all(log_sigma >= -5.0)) and bool(jnp.all(log_sigma <= 5.0))


def test_decoder_heads():
    model = Decoder(n_classes=2, predict_future_flow=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 32, 32, 16).astype(np.float32))
    out, _ = init_and_apply(model, x)
    assert out['segmentation'].shape == (1, 2, 32, 32, 2)
    assert out['instance_center'].shape == (1, 2, 32, 32, 1)
    assert out['instance_offset'].shape == (1, 2, 32, 32, 2)
    assert out['instance_flow'].shape == (1, 2, 32, 32, 2)
    assert bool(jnp.all(out['instance_center'] >= 0)) and bool(jnp.all(out['instance_center'] <= 1))

    model_no_flow = Decoder(n_classes=2, predict_future_flow=False)
    out, _ = init_and_apply(model_no_flow, x)
    assert out['instance_flow'] is None


def tiny_fiery_config(**overrides):
    kwargs = dict(
        time_receptive_field=3, n_future_frames=2,
        final_dim=(32, 48), x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5),
        d_bound=(2.0, 6.0, 1.0), encoder_name='efficientnet-b0', encoder_out_channels=16,
        start_out_channels=16, latent_dim=4, n_gru_blocks=1, n_res_layers=1)
    kwargs.update(overrides)
    return FieryConfig(**kwargs)


def tiny_batch(cfg, b=1, n=2, seq=None):
    rng = np.random.RandomState(0)
    seq = seq or (cfg.receptive_field + cfg.n_future)
    H, W = cfg.final_dim
    X, Y = cfg.bev_size
    image = jnp.asarray(rng.randn(b, seq, n, H, W, 3).astype(np.float32))
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    intr = jnp.broadcast_to(jnp.asarray(K), (b, seq, n, 3, 3))
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    extr = jnp.broadcast_to(jnp.asarray(E), (b, seq, n, 4, 4))
    ego = jnp.asarray(rng.randn(b, seq, 6).astype(np.float32) * 0.02)
    fdi = jnp.asarray(rng.randn(b, 1 + cfg.n_future, X, Y, 6).astype(np.float32))
    return image, intr, extr, ego, fdi


def test_fiery_forward_full():
    cfg = tiny_fiery_config()
    model = Fiery(cfg=cfg)
    image, intr, extr, ego, fdi = tiny_batch(cfg)
    X, Y = cfg.bev_size
    out, variables = init_and_apply(model, image, intr, extr, ego, fdi, train=True)
    s_out = 1 + cfg.n_future
    assert out['segmentation'].shape == (1, s_out, X, Y, 2)
    assert out['instance_flow'].shape == (1, s_out, X, Y, 2)
    assert out['present_mu'].shape == (1, 1, 4)
    assert out['future_mu'].shape == (1, 1, 4)
    assert 'batch_stats' in variables


def test_depth_cull_cfg_exclusivity():
    """LIFT.DEPTH_CULL must be rejected at the cfg surface when combined with
    LIFT.TOPK or LIFT.WARP_FREE — the rig-dependent depth_keep counts are only
    computed at Trainer construction, so without this early guard the
    contradiction would surface late (or never, for eval-only graphs)."""
    from fiery_tpu.utils.config import get_cfg
    for extra in ({'TOPK': 8}, {'WARP_FREE': True}):
        cfg = get_cfg(cfg_dict={'LIFT': {'DEPTH_CULL': True, **extra}})
        with pytest.raises(ValueError, match='DEPTH_CULL is exclusive'):
            FieryConfig.from_cfg(cfg)
    # each alone is fine
    FieryConfig.from_cfg(get_cfg(cfg_dict={'LIFT': {'DEPTH_CULL': True}}))
    FieryConfig.from_cfg(get_cfg(cfg_dict={'LIFT': {'WARP_FREE': True}}))


def test_fiery_topk_sparse_splat_forward():
    """LIFT.TOPK graph: sparse splat path compiles end-to-end; k == D
    reproduces the dense model's outputs exactly (same params)."""
    cfg = tiny_fiery_config()
    D = cfg.depth_channels
    cfg_topk = tiny_fiery_config(depth_topk=D)
    image, intr, extr, ego, fdi = tiny_batch(cfg)
    model = Fiery(cfg=cfg)
    out, variables = init_and_apply(model, image, intr, extr, ego, fdi, train=True)
    out_k = Fiery(cfg=cfg_topk).apply(
        variables, image, intr, extr, ego, fdi, train=True,
        rngs={'sample': jax.random.key(3), 'dropout': jax.random.key(4)},
        mutable=['batch_stats'])[0]
    np.testing.assert_allclose(np.asarray(out_k['segmentation']),
                               np.asarray(out['segmentation']),
                               rtol=1e-4, atol=1e-4)
    # k < D: still finite, right shapes, but not identical to dense
    out_s = Fiery(cfg=tiny_fiery_config(depth_topk=2)).apply(
        variables, image, intr, extr, ego, fdi, train=True,
        rngs={'sample': jax.random.key(3), 'dropout': jax.random.key(4)},
        mutable=['batch_stats'])[0]
    assert bool(jnp.all(jnp.isfinite(out_s['segmentation'])))
    assert out_s['segmentation'].shape == out['segmentation'].shape


def test_fiery_eval_deterministic_uses_present_mean():
    """Eval with noise=None must be deterministic (zero noise, present mu)."""
    cfg = tiny_fiery_config()
    model = Fiery(cfg=cfg)
    image, intr, extr, ego, fdi = tiny_batch(cfg)
    variables = model.init({'params': jax.random.key(0), 'sample': jax.random.key(1),
                            'dropout': jax.random.key(2)},
                           image, intr, extr, ego, fdi, train=False)
    out1 = model.apply(variables, image, intr, extr, ego, None, train=False)
    out2 = model.apply(variables, image, intr, extr, ego, None, train=False)
    np.testing.assert_allclose(np.asarray(out1['segmentation']),
                               np.asarray(out2['segmentation']))
    assert out1['future_mu'] is None


def test_fiery_single_frame_static():
    """single_timeframe graph: identity temporal model, no future, no flow, no probabilistic."""
    cfg = tiny_fiery_config(time_receptive_field=1, n_future_frames=0,
                            temporal_name='identity', input_egopose=False,
                            probabilistic_enabled=False, instance_flow_enabled=False)
    model = Fiery(cfg=cfg)
    image, intr, extr, ego, _ = tiny_batch(cfg, seq=1)
    X, Y = cfg.bev_size
    out, _ = init_and_apply(model, image, intr, extr, ego, None, train=True)
    assert out['segmentation'].shape == (1, 1, X, Y, 2)
    assert out['instance_flow'] is None
    assert 'present_mu' not in out


def test_fiery_bf16_compute():
    """PRECISION 16 -> bf16 compute: outputs f32, finite, params still f32."""
    cfg = tiny_fiery_config(precision=16)
    model = Fiery(cfg=cfg)
    image, intr, extr, ego, fdi = tiny_batch(cfg)
    out, variables = init_and_apply(model, image, intr, extr, ego, fdi, train=True)
    assert out['segmentation'].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out['segmentation'])))
    assert bool(jnp.all(jnp.isfinite(out['future_mu'])))
    # params are stored in f32 (mixed precision keeps master weights full precision)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables['params']))
    # BN running stats stay f32 too
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables['batch_stats']))


def test_causal_avg_pool_matches_torch():
    """_causal_avg_pool3d must match torch AvgPool3d(count_include_pad=False) with the
    reference's padding/slicing (temporal.py:186-207)."""
    import torch
    from fiery_tpu.models.temporal_layers import _causal_avg_pool3d
    rng = np.random.RandomState(0)
    b, t, h, w, c = 2, 3, 8, 8, 4
    x = rng.randn(b, t, h, w, c).astype(np.float32)
    pool = (2, 4, 4)
    ours = np.asarray(_causal_avg_pool3d(jnp.asarray(x), pool))

    xt = torch.as_tensor(x).permute(0, 4, 1, 2, 3)  # (b, c, t, h, w)
    ref = torch.nn.functional.avg_pool3d(
        xt, kernel_size=pool, stride=(1, pool[1], pool[2]), padding=(1, 0, 0),
        count_include_pad=False)[:, :, :-1]
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_causal_conv_matches_3d_oracle():
    """The per-tap shifted-sum causal conv must equal a direct (left-padded) 3D conv."""
    import torch
    from fiery_tpu.models.temporal_layers import _CausalTapConv
    rng = np.random.RandomState(1)
    b, t, h, w, c, o = 1, 3, 6, 6, 4, 5
    x = rng.randn(b, t, h, w, c).astype(np.float32)
    m = _CausalTapConv(out_channels=o, in_channels=c, kt=2, kernel_hw=(3, 3))
    variables = m.init({'params': jax.random.key(0)}, jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    kernel = np.asarray(variables['params']['kernel'])   # (3, 3, 2*c, o)
    # reconstruct the equivalent torch conv3d weight (o, c, 2, 3, 3)
    k = kernel.reshape(3, 3, 2, c, o)
    wt = np.transpose(k, (4, 3, 2, 0, 1))
    xt = torch.as_tensor(x).permute(0, 4, 1, 2, 3)
    xt = torch.nn.functional.pad(xt, (1, 1, 1, 1, 1, 0))  # w, h, causal t
    ref = torch.nn.functional.conv3d(xt, torch.as_tensor(wt)).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_fishing_stress_config_shapes():
    """fishing_setting.yml geometry: 10 cm grid -> 320x192 BEV, 28 depth bins."""
    cfg = FieryConfig(
        time_receptive_field=2, n_future_frames=1,
        final_dim=(32, 48), x_bound=(-16.0, 16.0, 0.1), y_bound=(-9.6, 9.7, 0.1),
        d_bound=(2.0, 16.0, 0.5), encoder_name='efficientnet-b0',
        encoder_out_channels=8, start_out_channels=8, latent_dim=2,
        n_gru_blocks=1, n_res_layers=1)
    assert cfg.bev_size == (320, 192)
    assert cfg.depth_channels == 28
    model = Fiery(cfg=cfg)
    image, intr, extr, ego, _ = tiny_batch(cfg, seq=3)
    fdi = jnp.zeros((1, 2, 320, 192, 6))
    out, _ = init_and_apply(model, image, intr, extr, ego, fdi, train=False)
    assert out['segmentation'].shape == (1, 2, 320, 192, 2)


def test_uint8_image_input_matches_prenormalized():
    """A RAW uint8 image batch must produce the same outputs as the equivalent
    host-normalised f32 batch (on-device ImageNet normalisation, fiery.py)."""
    import numpy as np
    import jax.numpy as jnp
    from fiery_tpu.models.fiery import Fiery, FieryConfig, _IMAGENET_MEAN, _IMAGENET_STD

    cfg = FieryConfig(
        time_receptive_field=3, n_future_frames=2, final_dim=(32, 48),
        x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5),
        d_bound=(2.0, 6.0, 1.0), encoder_name='efficientnet-b0',
        encoder_out_channels=16, start_out_channels=16, latent_dim=4,
        n_gru_blocks=2, n_res_layers=2)
    model = Fiery(cfg=cfg)
    rng = np.random.RandomState(0)
    b, s, n = 1, 5, 2
    img_u8 = rng.randint(0, 256, (b, s, n, 32, 48, 3)).astype(np.uint8)
    img_f32 = (img_u8.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    K = np.array([[20.0, 0, 24], [0, 20.0, 16], [0, 0, 1]], np.float32)
    intr = jnp.broadcast_to(jnp.asarray(K), (b, s, n, 3, 3))
    extr = jnp.broadcast_to(jnp.asarray(np.eye(4, dtype=np.float32)), (b, s, n, 4, 4))
    ego = jnp.zeros((b, s, 6))
    noise = jnp.zeros((b, 1, 4))
    variables = jax.jit(model.init, static_argnames='train')(
        {'params': jax.random.key(0)}, jnp.asarray(img_u8), intr, extr, ego,
        None, train=False)
    out_u8 = model.apply(variables, jnp.asarray(img_u8), intr, extr, ego, None,
                         noise, train=False)
    out_f32 = model.apply(variables, jnp.asarray(img_f32), intr, extr, ego, None,
                          noise, train=False)
    for k in out_u8:
        if out_u8[k] is None:
            continue
        np.testing.assert_allclose(np.asarray(out_u8[k]), np.asarray(out_f32[k]),
                                   atol=1e-5, err_msg=k)


def test_packed_epilogue_bit_exact(monkeypatch):
    """FIERY_PACKED_EPILOGUE applies the BN's following relu/residual-add on
    the lane-packed view before unpacking — must be bit-identical to the
    unpacked epilogue for every folded pattern (relu / add / relu_add /
    add_relu, identity and projected residuals)."""
    from fiery_tpu.models.decoder import BasicBlock

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 64), jnp.float32)
    up = jnp.tile(x, (1, 2, 2, 1))
    seq = jax.random.normal(jax.random.key(3), (2, 3, 8, 8, 64), jnp.float32)
    cases = [
        (ConvBlock(64), (x,)),
        (Bottleneck(64), (x,)),                    # identity: relu_add
        (Bottleneck(96), (x,)),                    # projected: relu + add
        (Bottleneck(64, downsample=True), (x,)),
        (UpsamplingAdd(64), (x, up)),
        (UpsamplingConcat(64), (x, up)),
        (BasicBlock(64), (x,)),                    # identity: add_relu
        (BasicBlock(128, 2), (x,)),                # projected: add_relu
        (Bottleneck3D(96), (seq,)),                # packed-seq skip: add
    ]
    for mod, args in cases:
        outs = []
        for flag in ('0', '1'):
            monkeypatch.setenv('FIERY_PACKED_EPILOGUE', flag)
            v = mod.init(jax.random.key(1), *args, train=True)
            out, _ = mod.apply(v, *args, train=True, mutable=['batch_stats'])
            outs.append(np.asarray(out))
        np.testing.assert_array_equal(
            outs[0], outs[1], err_msg=type(mod).__name__)


def test_max_pool_2x2_matches_reduce_window():
    """Reshape-max pool: forward bit-identical to nn.max_pool; gradient sum
    per window identical (subgradient tie choice may differ — both valid)."""
    import flax.linen as nn
    from fiery_tpu.models.layers import max_pool_2x2
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 12, 5), jnp.float32)
    # inject exact ties to exercise the tie path
    x = x.at[0, 0, 0, 0].set(x[0, 0, 1, 0])
    y_ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    y = max_pool_2x2(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    g_ref = jax.grad(lambda v: jnp.sum(nn.max_pool(v, (2, 2),
                                                   strides=(2, 2)) ** 2))(x)
    g = jax.grad(lambda v: jnp.sum(max_pool_2x2(v) ** 2))(x)
    # per-window gradient sums agree even at ties
    def wsum(t):
        return np.asarray(t).reshape(2, 4, 2, 6, 2, 5).sum(axis=(2, 4))
    np.testing.assert_allclose(wsum(g), wsum(g_ref), rtol=1e-6, atol=1e-6)
