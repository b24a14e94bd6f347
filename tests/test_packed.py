"""Space-to-channel packed convolution equivalence (fiery_tpu/models/packed.py).

The packed lowering must be numerically equivalent to the unpacked modules
under the SAME parameter tree — it is a layout optimisation, not a model
change (reference semantics: plain NCHW convs, /root/reference/fiery/layers/
convolutions.py:9-61 and temporal.py:10-62).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiery_tpu.models.packed import PackedConv, pack_kernel, pack_w, unpack_w
from fiery_tpu.models.layers import Bottleneck
from fiery_tpu.models.temporal_layers import SpatialGRU
from fiery_tpu.models.future_prediction import FuturePrediction


pytestmark = pytest.mark.fast


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 8 * 3, dtype=jnp.float32).reshape(2, 4, 8, 3)
    for k in (1, 2, 4):
        xp = pack_w(x, k)
        assert xp.shape == (2, 4, 8 // k, 3 * k)
        np.testing.assert_array_equal(unpack_w(xp, k), x)
    # packed channel j = s*C + c: column k*x'+s, channel c
    xp = pack_w(x, 2)
    np.testing.assert_array_equal(xp[0, 0, 0, :3], x[0, 0, 0])
    np.testing.assert_array_equal(xp[0, 0, 0, 3:], x[0, 0, 1])


@pytest.mark.parametrize('shape', [
    # (H, W, Cin, Cout, Kh, Kw, k, bias)
    (8, 12, 6, 10, 3, 3, 2, False),
    (8, 16, 6, 10, 3, 3, 4, True),
    (5, 12, 7, 5, 1, 1, 2, True),
    (9, 20, 3, 8, 5, 5, 4, False),
    (8, 12, 6, 10, 3, 1, 2, False),   # 1-wide kernel on the packed axis
])
def test_packed_conv_matches_conv(shape):
    H, W, Cin, Cout, Kh, Kw, k, bias = shape
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, H, W, Cin), jnp.float32)
    ref = nn.Conv(Cout, (Kh, Kw), padding=(((Kh - 1) // 2,) * 2,
                                           ((Kw - 1) // 2,) * 2),
                  use_bias=bias, name='Conv_0')
    pc = PackedConv(Cout, (Kh, Kw), k=k, use_bias=bias, name='Conv_0')
    params = ref.init(rng, x)
    y_ref = ref.apply(params, x)
    y_p = unpack_w(pc.apply(params, pack_w(x, k)), k)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_in_parts_concat():
    """Packed conv over a channel-concat of two packed tensors equals the
    unpacked conv over the plain concat (the GRU's input shape)."""
    Ca, Cb, Cout, k = 6, 10, 12, 2
    rng = jax.random.PRNGKey(0)
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, Ca))
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, Cb))
    ref = nn.Conv(Cout, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                  name='Conv_0')
    params = ref.init(rng, jnp.concatenate([xa, xb], -1))
    y_ref = ref.apply(params, jnp.concatenate([xa, xb], -1))
    pc = PackedConv(Cout, (3, 3), k=k, use_bias=True, name='Conv_0',
                    in_channels=Ca + Cb, in_parts=[(Ca, 0), (Cb, Ca)])
    y_p = unpack_w(pc.apply(params, jnp.concatenate(
        [pack_w(xa, k), pack_w(xb, k)], -1)), k)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_out_parts_gate_split():
    """out_parts=[(H,0),(H,H)] makes out[..., :k*H] the packed first half of
    the output channels (the GRU gate split)."""
    Ca, H, k = 6, 5, 2
    rng = jax.random.PRNGKey(0)
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, Ca))
    ref = nn.Conv(2 * H, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                  name='Conv_0')
    params = ref.init(rng, xa)
    y_ref = ref.apply(params, xa)
    pc = PackedConv(2 * H, (3, 3), k=k, use_bias=True, name='Conv_0',
                    in_channels=Ca, out_parts=[(H, 0), (H, H)])
    y_p = pc.apply(params, pack_w(xa, k))
    np.testing.assert_allclose(np.asarray(unpack_w(y_p[..., :k * H], k)),
                               np.asarray(y_ref[..., :H]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unpack_w(y_p[..., k * H:], k)),
                               np.asarray(y_ref[..., H:]), rtol=1e-5, atol=1e-5)


def test_packed_bottleneck_matches():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 12, 16), jnp.float32)
    m0 = Bottleneck()
    mk = Bottleneck(packed_k=2)
    v = m0.init({'params': rng}, x, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(
        mk.init({'params': rng}, pack_w(x, 2), train=True))
    for train in (False, True):
        y0, s0 = m0.apply(v, x, train=train, mutable=['batch_stats'])
        yk, sk = mk.apply(v, pack_w(x, 2), train=train, mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(unpack_w(yk, 2)), np.asarray(y0),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_packed_spatial_gru_matches():
    rng = jax.random.PRNGKey(0)
    b, t, H, W, cx, hs, k = 2, 3, 8, 12, 6, 16, 2
    x = jax.random.normal(rng, (b, t, H, W, cx), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, hs), jnp.float32)
    m0 = SpatialGRU(hs)
    mk = SpatialGRU(hs, packed_k=k)
    v = m0.init({'params': rng}, x, h0, train=True)
    for train in (False, True):
        y0, _ = m0.apply(v, x, h0, train=train, mutable=['batch_stats'])
        yk, _ = mk.apply(v, pack_w(x, k), pack_w(h0, k), train=train,
                         mutable=['batch_stats'])
        np.testing.assert_allclose(np.asarray(unpack_w(yk, k)), np.asarray(y0),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('k', [2, 4])
def test_packed_future_prediction_matches(k):
    """Full rollout: packed_k path == unpacked path under one param tree,
    outputs and updated batch_stats both (the FIERY_PACKED_SPACE lever is a
    pure lowering change)."""
    rng = jax.random.PRNGKey(0)
    b, t, H, W, latent, hs = 2, 3, 8, 16, 6, 16
    x = jax.random.normal(rng, (b, t, H, W, latent), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, hs), jnp.float32)
    m0 = FuturePrediction(in_channels=hs, n_gru_blocks=2, n_res_layers=2)
    mk = FuturePrediction(in_channels=hs, n_gru_blocks=2, n_res_layers=2,
                          packed_k=k)
    v = m0.init({'params': rng}, x, h0, train=True)
    pk = mk.init({'params': rng}, x, h0, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(pk)
    assert all(a.shape == bb.shape for a, bb in
               zip(jax.tree.leaves(v), jax.tree.leaves(pk)))
    for train in (False, True):
        y0, s0 = m0.apply(v, x, h0, train=train, mutable=['batch_stats'])
        yk, sk = mk.apply(v, x, h0, train=train, mutable=['batch_stats'])
        assert yk.shape == y0.shape
        scale = max(float(jnp.abs(y0).max()), 1e-9)
        assert float(jnp.abs(yk - y0).max()) / scale < 1e-5
        for a, bb in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('pyramid', [False, True])
def test_packed_temporal_model_matches(pyramid):
    """TemporalModel packed_k path == unpacked path (incl. the skip-projected
    first block, per-tap causal convs, prolog out_parts BN, pyramid pooling
    bridged through an unpack/re-pack, and trim mode)."""
    from fiery_tpu.models.temporal_model import TemporalModel
    rng = jax.random.PRNGKey(0)
    b, t, H, W, C = 2, 3, 8, 12, 10
    x = jax.random.normal(rng, (b, t, H, W, C), jnp.float32)
    m0 = TemporalModel(receptive_field=3, input_shape=(H, W),
                       start_out_channels=8, use_pyramid_pooling=pyramid)
    mk = TemporalModel(receptive_field=3, input_shape=(H, W),
                       start_out_channels=8, use_pyramid_pooling=pyramid,
                       packed_k=2)
    v = m0.init({'params': rng}, x, train=True)
    pk = mk.init({'params': rng}, x, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(pk)
    assert all(a.shape == bb.shape for a, bb in
               zip(jax.tree.leaves(v), jax.tree.leaves(pk)))
    for train in (False, True):
        for trim in (False, True):
            y0, s0 = m0.apply(v, x, train=train, trim=trim,
                              mutable=['batch_stats'])
            yk, sk = mk.apply(v, x, train=train, trim=trim,
                              mutable=['batch_stats'])
            scale = max(float(jnp.abs(y0).max()), 1e-9)
            assert float(jnp.abs(yk - y0).max()) / scale < 2e-5
            for a, bb in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                           rtol=1e-5, atol=1e-6)


def test_packed_bottleneck3d_matches():
    from fiery_tpu.models.temporal_model import TemporalModel
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 8, 12, 10), jnp.float32)
    kw = dict(receptive_field=2, input_shape=(8, 12), start_out_channels=8,
              n_spatial_layers_between_temporal_layers=2,
              use_pyramid_pooling=False)
    m0, mk = TemporalModel(**kw), TemporalModel(**kw, packed_k=2)
    v = m0.init({'params': rng}, x, train=True)
    y0, _ = m0.apply(v, x, train=True, mutable=['batch_stats'])
    yk, _ = mk.apply(v, x, train=True, mutable=['batch_stats'])
    scale = max(float(jnp.abs(y0).max()), 1e-9)
    assert float(jnp.abs(yk - y0).max()) / scale < 2e-5


def test_packed_gradients_match():
    """Gradients through the packed lowering match the unpacked ones (the
    kernel rearrangement is linear, so d/dparams commutes with packing)."""
    rng = jax.random.PRNGKey(0)
    b, t, H, W, latent, hs = 1, 2, 8, 12, 4, 8
    x = jax.random.normal(rng, (b, t, H, W, latent), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, hs), jnp.float32)
    m0 = FuturePrediction(in_channels=hs, n_gru_blocks=1, n_res_layers=1)
    mk = FuturePrediction(in_channels=hs, n_gru_blocks=1, n_res_layers=1,
                          packed_k=2)
    v = m0.init({'params': rng}, x, h0, train=True)

    def loss(params, m):
        y, _ = m.apply({'params': params, 'batch_stats': v['batch_stats']},
                       x, h0, train=True, mutable=['batch_stats'])
        return jnp.sum(y * y)

    g0 = jax.grad(lambda p: loss(p, m0))(v['params'])
    gk = jax.grad(lambda p: loss(p, mk))(v['params'])
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g0))
    for a, bb in zip(jax.tree.leaves(g0), jax.tree.leaves(gk)):
        assert float(jnp.abs(a - bb).max()) / gmax < 1e-5


@pytest.mark.parametrize('case', [
    # (W, Cin, Cout, Kw, stride, k_in, k_out)
    (16, 6, 10, 7, 2, 2, 2),     # decoder conv7x7 s2 packed->packed
    (16, 6, 10, 3, 2, 2, 1),     # layer2 downsample: packed->unpacked
    (16, 6, 10, 1, 2, 2, 1),     # 1x1 s2 projection: packed->unpacked
    (16, 6, 10, 3, 1, 2, 2),     # stride-1 sanity vs pack_kernel path
    (16, 6, 10, 5, 2, 2, 2),
    (24, 4, 8, 7, 2, 4, 2),      # mixed k_in=4 -> k_out=2
    (24, 4, 8, 3, 2, 4, 1),
    (16, 6, 10, 3, 4, 2, 1),     # stride 4
])
def test_packed_conv_strided_matches_conv(case):
    W, Cin, Cout, Kw, stride, k_in, k_out = case
    H, Kh = 12, 3
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, H, W, Cin), jnp.float32)
    ref = nn.Conv(Cout, (Kh, Kw), strides=(stride, stride),
                  padding=(((Kh - 1) // 2,) * 2, ((Kw - 1) // 2,) * 2),
                  use_bias=False, name='Conv_0')
    pc = PackedConv(Cout, (Kh, Kw), k=k_in, stride=stride, k_out=k_out,
                    name='Conv_0')
    params = ref.init(rng, x)
    y_ref = ref.apply(params, x)
    y_p = unpack_w(pc.apply(params, pack_w(x, k_in)), k_out)
    assert y_p.shape == y_ref.shape, (y_p.shape, y_ref.shape)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('stride', [1, 2])
def test_packed_basic_block_matches(stride):
    from fiery_tpu.models.decoder import BasicBlock
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 8, 12, 6), jnp.float32)
    m0 = BasicBlock(10, stride)
    mk = BasicBlock(10, stride, packed_k=2)
    v = m0.init({'params': rng}, x, train=True)
    pk = mk.init({'params': rng}, pack_w(x, 2), train=True)
    assert jax.tree.structure(v) == jax.tree.structure(pk)
    for train in (False, True):
        y0, s0 = m0.apply(v, x, train=train, mutable=['batch_stats'])
        yk, sk = mk.apply(v, pack_w(x, 2), train=train,
                          mutable=['batch_stats'])
        if stride == 1:
            yk = unpack_w(yk, 2)
        scale = max(float(jnp.abs(y0).max()), 1e-9)
        assert float(jnp.abs(yk - y0).max()) / scale < 2e-5
        for a, bb in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('packed_in', [False, True])
def test_packed_upsampling_add_matches(packed_in):
    from fiery_tpu.models.layers import UpsamplingAdd
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 4, 6, 8), jnp.float32)
    skip = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 12, 5), jnp.float32)
    m0 = UpsamplingAdd(5)
    mk = UpsamplingAdd(5, packed_k=2, packed_in=packed_in)
    v = m0.init({'params': rng}, x, skip, train=True)
    xk = pack_w(x, 2) if packed_in else x
    pk = mk.init({'params': rng}, xk, pack_w(skip, 2), train=True)
    assert jax.tree.structure(v) == jax.tree.structure(pk)
    for train in (False, True):
        y0, s0 = m0.apply(v, x, skip, train=train, mutable=['batch_stats'])
        yk, sk = mk.apply(v, xk, pack_w(skip, 2), train=train,
                          mutable=['batch_stats'])
        yk = unpack_w(yk, 2)
        scale = max(float(jnp.abs(y0).max()), 1e-9)
        assert float(jnp.abs(yk - y0).max()) / scale < 2e-5
        for a, bb in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('flow', [True, False])
def test_packed_decoder_matches(flow):
    """Full Decoder packed_k path == unpacked path (same param tree), incl.
    the strided packed stem, layer1, the pack/unpack stride-2 transition,
    both packed UpsamplingAdds, and the packed fused heads."""
    from fiery_tpu.models.decoder import Decoder
    rng = jax.random.PRNGKey(0)
    # W=16: smallest width divisible by 4*k with two stride-2 halvings
    x = jax.random.normal(rng, (1, 2, 16, 16, 6), jnp.float32)
    m0 = Decoder(n_classes=2, predict_future_flow=flow)
    mk = Decoder(n_classes=2, predict_future_flow=flow, packed_k=2)
    v = m0.init({'params': rng}, x, train=True)
    pk = mk.init({'params': rng}, x, train=True)
    assert jax.tree.structure(v) == jax.tree.structure(pk)
    assert all(a.shape == bb.shape for a, bb in
               zip(jax.tree.leaves(v), jax.tree.leaves(pk)))
    for train in (False, True):
        y0, s0 = m0.apply(v, x, train=train, mutable=['batch_stats'])
        yk, sk = mk.apply(v, x, train=train, mutable=['batch_stats'])
        for key in y0:
            if y0[key] is None:
                assert yk[key] is None
                continue
            scale = max(float(jnp.abs(y0[key]).max()), 1e-9)
            assert float(jnp.abs(yk[key] - y0[key]).max()) / scale < 2e-5, key
        for a, bb in zip(jax.tree.leaves(s0), jax.tree.leaves(sk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-5, atol=1e-6)


def test_packed_decoder_gradients_match():
    from fiery_tpu.models.decoder import Decoder
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 2, 16, 16, 6), jnp.float32)
    m0 = Decoder(n_classes=2)
    mk = Decoder(n_classes=2, packed_k=2)
    v = m0.init({'params': rng}, x, train=True)

    def loss(mod, vv):
        def f(p):
            out, _ = mod.apply({'params': p, 'batch_stats': vv['batch_stats']},
                               x, train=True, mutable=['batch_stats'])
            return sum(jnp.sum(o * o) for o in out.values() if o is not None)
        return jax.grad(f)(vv['params'])

    g0 = loss(m0, v)
    gk = loss(mk, v)
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g0))
    for a, bb in zip(jax.tree.leaves(g0), jax.tree.leaves(gk)):
        assert float(jnp.abs(a - bb).max()) / gmax < 5e-5


def test_packed_k_eval_selects_lowering():
    """packed_k_eval decouples the serving lowering from training: with
    packed_k=2, packed_k_eval=1 the train=False graph is the plain unpacked
    one (bit-identical outputs to an unpacked module) while train=True still
    runs packed (allclose to the packed module). This is the
    FIERY_PACKED_SPACE_EVAL wiring (models/fiery.py); round 5 measured packed
    serving FASTER (+18%) with trusted timing, so the default is packed, but
    the call-time selection stays — either lowering is exact."""
    rng = jax.random.PRNGKey(0)
    b, t, H, W, latent, hs = 2, 3, 8, 16, 6, 16
    x = jax.random.normal(rng, (b, t, H, W, latent), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, hs), jnp.float32)
    m0 = FuturePrediction(in_channels=hs, n_gru_blocks=2, n_res_layers=2)
    me = FuturePrediction(in_channels=hs, n_gru_blocks=2, n_res_layers=2,
                          packed_k=2, packed_k_eval=1)
    mk = FuturePrediction(in_channels=hs, n_gru_blocks=2, n_res_layers=2,
                          packed_k=2)
    v = m0.init({'params': rng}, x, h0, train=True)
    # eval: identical graph to the unpacked module -> bit-identical outputs
    y0 = m0.apply(v, x, h0, train=False)
    ye = me.apply(v, x, h0, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(ye))
    # train: identical graph to the packed module -> bit-identical outputs
    yk, sk = mk.apply(v, x, h0, train=True, mutable=['batch_stats'])
    yt, st = me.apply(v, x, h0, train=True, mutable=['batch_stats'])
    np.testing.assert_array_equal(np.asarray(yk), np.asarray(yt))
    for a, bb in zip(jax.tree.leaves(sk), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_slotwise_conv1x1_matches_conv():
    """SlotwiseConv1x1: same params AND same FLOPs as the unpacked 1x1 conv."""
    from fiery_tpu.models.packed import SlotwiseConv1x1
    rng = jax.random.PRNGKey(0)
    for k, bias in ((2, False), (4, True)):
        x = jax.random.normal(rng, (2, 6, 8 * k, 5), jnp.float32)
        ref = nn.Conv(9, (1, 1), use_bias=bias, name='Conv_0')
        sw = SlotwiseConv1x1(9, k=k, use_bias=bias, name='Conv_0')
        params = ref.init(rng, x)
        y_ref = ref.apply(params, x)
        y_p = unpack_w(sw.apply(params, pack_w(x, k)), k)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('hw', [(16, 24), (17, 25), (10, 12)])
def test_packed_conv_tf_same_stem(hw):
    """PackedConv with explicit asymmetric TF-SAME padding == nn.Conv SAME
    (the EfficientNet stem: 3x3 s2 from unpacked input to a packed output)."""
    H, W = hw
    k = 2
    while (-(-W // 2)) % k:
        W += 1   # packed stem output width must divide k
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, H, W, 3), jnp.float32)
    ref = nn.Conv(10, (3, 3), strides=(2, 2), padding='SAME', use_bias=False,
                  name='Conv_0')
    pad = tuple((t // 2, t - t // 2)
                for t in (2 - (H - 1) % 2, 2 - (W - 1) % 2))
    pc = PackedConv(10, (3, 3), k=1, k_out=k, stride=2, padding=pad,
                    use_bias=False, name='Conv_0')
    params = ref.init(rng, x)
    y_ref = ref.apply(params, x)
    y_p = unpack_w(pc.apply(params, x), k)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('spec', [
    # (kernel, stride, expand, in_ch, out_ch) — stage-1 (no expand, skip),
    # stage-2-head (stride 2), mid block (expand 6, skip)
    (3, 1, 1, 8, 6), (3, 2, 6, 6, 10), (5, 1, 6, 10, 10)])
@pytest.mark.parametrize('train', [False, True])
def test_packed_mbconv_matches(spec, train):
    """Packed MBConvBlock == unpacked under the SAME param tree, both modes,
    including the updated batch_stats."""
    from fiery_tpu.models.efficientnet import MBConvBlock
    kk, s, e, ci, co = spec
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 8, 12, ci), jnp.float32)
    kwargs = dict(kernel=kk, stride=s, expand_ratio=e, out_channels=co,
                  se_ratio=0.25)
    ref = MBConvBlock(**kwargs)
    packed = MBConvBlock(**kwargs, packed_k=2)
    variables = ref.init({'params': rng}, x, train=False)
    if train:
        y_ref, m_ref = ref.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
        y_p, m_p = packed.apply(variables, pack_w(x, 2), train=True,
                                mutable=['batch_stats'])
        key = lambda e: str(e[0])
        for (pa, a), (pb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(m_ref), key=key),
                sorted(jax.tree_util.tree_leaves_with_path(m_p), key=key)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=str(pa))
    else:
        y_ref = ref.apply(variables, x, train=False)
        y_p = packed.apply(variables, pack_w(x, 2), train=False)
    np.testing.assert_allclose(np.asarray(unpack_w(y_p, 2)), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('version', ['b0', 'b4'])
def test_packed_efficientnet_fpn_matches(version):
    """Whole packed backbone == unpacked on a shape where every stage width
    divides (W=64: stem 32 -> 16 -> 8 -> 4)."""
    from fiery_tpu.models.efficientnet import EfficientNetFPN
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 32, 64, 3), jnp.float32)
    ref = EfficientNetFPN(version=version, downsample=8)
    packed = EfficientNetFPN(version=version, downsample=8, packed_k=2)
    variables = ref.init({'params': rng}, x, train=False)
    hi_ref, lo_ref = ref.apply(variables, x, train=False)
    hi_p, lo_p = packed.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_ref),
                               rtol=1e-4, atol=1e-5)
    # identical param trees by construction
    p2 = packed.init({'params': rng}, x, train=False)
    assert (jax.tree_util.tree_structure(variables['params'])
            == jax.tree_util.tree_structure(p2['params']))
    for a, b in zip(jax.tree_util.tree_leaves(variables['params']),
                    jax.tree_util.tree_leaves(p2['params'])):
        assert a.shape == b.shape


def test_packed_efficientnet_fpn_gradients_match():
    from fiery_tpu.models.efficientnet import EfficientNetFPN
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (1, 16, 32, 3), jnp.float32)
    ref = EfficientNetFPN(version='b0', downsample=8)
    packed = EfficientNetFPN(version='b0', downsample=8, packed_k=2)
    variables = ref.init({'params': rng}, x, train=False)

    def loss(module):
        def f(params):
            hi, lo = module.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                x, train=False)
            return jnp.sum(hi ** 2) + jnp.sum(lo ** 2)
        return f

    g_ref = jax.grad(loss(ref))(variables['params'])
    g_p = jax.grad(loss(packed))(variables['params'])
    scale = max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g_ref))
    key = lambda e: str(e[0])
    for (pa, a), (_, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_p), key=key)):
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=1e-4, err_msg=str(pa))


def test_packed_encoder_env_flag(monkeypatch):
    """FIERY_PACKED_ENCODER routes the Encoder through the packed backbone
    with unchanged outputs and param paths (weight-import compatibility)."""
    from fiery_tpu.models.encoder import Encoder
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, 16, 32, 3), jnp.float32)
    enc = Encoder(out_channels=8, depth_channels=4, version='b0', downsample=8)
    monkeypatch.delenv('FIERY_PACKED_ENCODER', raising=False)
    variables = enc.init({'params': rng}, x, train=False)
    y_ref = enc.apply(variables, x, train=False)
    monkeypatch.setenv('FIERY_PACKED_ENCODER', '2')
    enc2 = Encoder(out_channels=8, depth_channels=4, version='b0', downsample=8)
    y_p = enc2.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
