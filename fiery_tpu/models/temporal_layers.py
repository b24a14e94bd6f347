"""Temporal building blocks and the SpatialGRU, layout (B, T, H, W, C).

Re-design of the reference temporal layer zoo (/root/reference/fiery/layers/temporal.py)
with a TPU-critical twist: there are NO 3D convolutions. On TPU, NDHWC conv3d with a
tiny time extent (T = 3..10) forces the time dimension into the (8, 128) tile and pads
activations 2-4x (measured 700 MB per conv at baseline shapes). Instead:

  * a causal (kt, 3, 3) conv over time keeps the conv3d kernel parameter
    (3, 3, kt*C, O) but is computed as kt per-tap 2D convs whose outputs are
    time-shifted and summed — identical maths (conv and frame-shift commute), no
    materialised kt*C channel stack (which cost layout copies and 2x activation
    bytes at 200x200 BEV resolution);
  * 1x1x1 convs are 1x1 2D convs over time packed into the batch;
  * the causal max pool maxes time-shifted spatial max-pools (same commutation);
  * the causal average pool (kernel 2, count_include_pad=False) is the explicit
    two-frame average with the first frame passed through.

Causality is preserved by left-shifting with zero padding; rollouts remain unrolled
python loops.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiery_tpu.models.layers import BatchNorm, ConvBlock, conv2d, conv_init, resize_bilinear
from fiery_tpu.utils.geometry import pack_sequence_dim, unpack_sequence_dim


def _shift_right(x, offset):
    """Shift (B, T, ...) right along time by ``offset`` frames, zero-filling the front."""
    if offset == 0:
        return x
    return jnp.concatenate([jnp.zeros_like(x[:, :offset]), x[:, :-offset]], axis=1)


class _CausalTapConv(nn.Module):
    """Holds a conv3d-shaped kernel (kh, kw, kt*C, O) — the exact parameter a torch
    Conv3d maps onto, so checkpoints and the weight importer are layout-stable — but
    evaluates it as kt per-tap 2D convs with time-shifted, summed outputs:

        out[t] = sum_i conv2d(x[t - (kt-1-i)], K[..., i*C:(i+1)*C, :])

    (taps ordered oldest-first like the channel stack of a causal conv3d; frames
    before t=0 are zero, matching the reference's causal zero padding,
    temporal.py:65-85). conv2d(frame-shift(x)) == frame-shift(conv2d(x)), so no
    kt*C-channel activation is ever materialised.
    """
    out_channels: int
    in_channels: int
    kt: int
    kernel_hw: Tuple[int, int]
    dtype: Optional[Any] = None
    packed_k: int = 1          # >1: x is the space-to-channel packed view
                               # (models/packed.py); per-tap kernels repack

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C) — or (B, T, H, W/k, k*C) when packed_k = k > 1
        kh, kw = self.kernel_hw
        kt, C = self.kt, self.in_channels
        kernel = self.param('kernel', conv_init, (kh, kw, kt * C, self.out_channels),
                            jnp.float32)
        kernel = kernel.astype(x.dtype)
        b, t = x.shape[:2]
        h = pack_sequence_dim(x)
        out = None
        for i in range(kt):
            tap = kernel[..., i * C:(i + 1) * C, :]
            if self.packed_k > 1:
                from fiery_tpu.models.packed import pack_kernel
                tap, (qL, qR) = pack_kernel(tap, self.packed_k)
                pads = [((kh - 1) // 2,) * 2, (qL, qR)]
            else:
                pads = [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2]
            dn = jax.lax.conv_dimension_numbers(h.shape, tap.shape,
                                                ('NHWC', 'HWIO', 'NHWC'))
            y = jax.lax.conv_general_dilated(h, tap, (1, 1), pads,
                                             dimension_numbers=dn)
            y = _shift_right(unpack_sequence_dim(y, b, t), kt - 1 - i)
            out = y if out is None else out + y
        return out


class Conv1x1x1NormActivated(nn.Module):
    """1x1(x1) conv + BN + ReLU over time packed into batch. Reference: temporal.py:107-117."""
    out_channels: int
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    kernel_init: Any = conv_init
    packed_k: int = 1                    # see models/packed.py
    in_channels: Optional[int] = None    # packed mode: original Cin
    in_parts: Optional[Any] = None       # packed mode: input channel layout
    out_parts: Optional[Any] = None      # packed mode: output channel layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[:2]
        h = pack_sequence_dim(x)
        if self.packed_k > 1:
            from fiery_tpu.models.packed import PackedConv
            h = PackedConv(self.out_channels, (1, 1), k=self.packed_k,
                           kernel_init=self.kernel_init, dtype=self.dtype,
                           in_channels=self.in_channels, in_parts=self.in_parts,
                           out_parts=self.out_parts, name='Conv_0')(h)
        else:
            h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        kernel_init=self.kernel_init,
                        dtype=self.dtype, name='Conv_0')(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu', packed_k=self.packed_k,
                      packed_parts=self.out_parts,
                      name='BatchNorm_0')(h, train)
        return unpack_sequence_dim(h, b, t)


class CausalConv3d(nn.Module):
    """Causal (kt, kh, kw) temporal conv + BN + ReLU, computed as a single 2D conv on
    causally-stacked channels. Reference: temporal.py:65-85.

    The kernel parameter has shape (kh, kw, kt*C_in, C_out); a torch Conv3d weight
    (O, C, kt, kh, kw) maps onto it via transpose(3, 4, 2, 1, 0).reshape(kh, kw, -1, O).
    """
    out_channels: int
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # see models/packed.py

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel_size
        assert self.dilation == (1, 1, 1), 'dilation unused by the reference'
        b, t = x.shape[:2]
        h = _CausalTapConv(out_channels=self.out_channels,
                           in_channels=x.shape[-1] // self.packed_k,
                           kt=kt, kernel_hw=(kh, kw), dtype=self.dtype,
                           packed_k=self.packed_k, name='Conv_0')(x)
        h = pack_sequence_dim(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu', packed_k=self.packed_k,
                      name='BatchNorm_0')(h, train)
        return unpack_sequence_dim(h, b, t)


def causal_max_pool3d(x, kernel_size=(2, 3, 3)):
    """Max pool, stride 1, causal time padding. Reference: temporal.py:88-104.

    Spatial max-pool commutes with frame shifting, so the (kt, kh, kw) pool is the
    running max of time-shifted 2D max-pools; frames before t=0 are zero like the
    reference's ConstantPad3d (temporal.py:74), hence the max with a zero frame at
    the sequence start.
    """
    kt, kh, kw = kernel_size
    b, t = x.shape[:2]
    h = pack_sequence_dim(x)
    pads = (((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    h = nn.max_pool(h, (kh, kw), strides=(1, 1), padding=pads)
    h = unpack_sequence_dim(h, b, t)
    out = h
    for offset in range(1, kt):
        out = jnp.maximum(out, _shift_right(h, offset))
    return out


class Bottleneck3D(nn.Module):
    """1x1 down-project -> causal temporal conv -> 1x1 up-project, + residual.

    Reference: temporal.py:120-164.
    """
    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # see models/packed.py

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.packed_k
        in_channels = x.shape[-1] // k
        out_channels = self.out_channels or in_channels
        mid = in_channels // 2
        h = Conv1x1x1NormActivated(mid, self.bn_momentum, self.dtype,
                                   packed_k=k)(x, train)
        h = CausalConv3d(mid, self.kernel_size, self.dilation, self.bn_momentum,
                         self.dtype, packed_k=k)(h, train)
        h = Conv1x1x1NormActivated(out_channels, self.bn_momentum, self.dtype,
                                   packed_k=k)(h, train)
        if out_channels != in_channels:
            b, t = x.shape[:2]
            skip = pack_sequence_dim(x)
            if k > 1:
                from fiery_tpu.models.packed import PackedConv
                skip = PackedConv(out_channels, (1, 1), k=k,
                                  kernel_init=conv_init, dtype=self.dtype,
                                  name='Conv_0')(skip)
            else:
                skip = nn.Conv(out_channels, (1, 1), use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='Conv_0')(skip)
            skip = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                             post='add', packed_k=k, name='BatchNorm_0')(
                                 skip, train, residual=pack_sequence_dim(h))
            return unpack_sequence_dim(skip, b, t)
        return h + x


def _causal_avg_pool3d(x, pool_size):
    """Reference AvgPool3d(kernel=(2, ph, pw), stride=(1, ph, pw), time pad (1, 1),
    count_include_pad=False) with the last step dropped == out[0] = spatial_avg(x[0]),
    out[t] = (spatial_avg(x[t-1]) + spatial_avg(x[t])) / 2. Reference: temporal.py:186-207.
    """
    kt, ph, pw = pool_size
    assert kt == 2
    b, t = x.shape[:2]
    h = pack_sequence_dim(x)
    h = nn.avg_pool(h, (ph, pw), strides=(ph, pw))     # floor-mode spatial average
    h = unpack_sequence_dim(h, b, t)
    prev = jnp.concatenate([h[:, :1], h[:, :-1]], axis=1)
    counts = jnp.concatenate([jnp.ones((1,)), jnp.full((t - 1,), 2.0)]).astype(h.dtype)
    return (jnp.where(jnp.arange(t)[None, :, None, None, None] == 0, 0.0, prev) + h) \
        / counts[None, :, None, None, None]


class PyramidSpatioTemporalPooling(nn.Module):
    """Causal spatio-temporal pyramid pooling. Reference: temporal.py:167-215."""
    reduction_channels: int
    pool_sizes: Sequence[Tuple[int, int, int]]
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False, drop_front: int = 0):
        # drop_front=1: frame 0 of x is causal context only — the avg pool's
        # out[0] (the special-cased sequence start) is dropped before the
        # reduction conv, so only the kept frames pay conv+BN+resize cost.
        b, t, h, w, _ = x.shape
        out = []
        for pool_size in self.pool_sizes:
            assert pool_size[0] == 2, 'time kernel must be 2 (reference constraint)'
            pooled = _causal_avg_pool3d(x, pool_size)[:, drop_front:]
            pooled = Conv1x1x1NormActivated(self.reduction_channels, self.bn_momentum,
                                            self.dtype)(pooled, train)
            pooled = resize_bilinear(pooled, (h, w))
            out.append(pooled)
        return jnp.concatenate(out, axis=-1)


class TemporalBlock(nn.Module):
    """Parallel causal conv paths (2x3x3, 1x3x3, 1x1x1) + optional pyramid pooling,
    aggregated by a 1x1 conv, with a residual connection. Reference: temporal.py:218-281.

    ``drop_front`` > 0 returns only output frames [drop_front:] while computing the
    strict minimum of per-frame work: because every temporal kernel here has extent
    <= 2, output frame t depends on input frames {t-1, t} only, so the prolog runs
    on frames [drop_front-1:] and everything after the causal taps on the final
    T - drop_front frames. Exact — the dropped leading frames never feed the kept
    ones (causality); at eval (running-stat BN) the kept frames are bit-identical
    to the full computation. In train mode BatchNorm batch statistics would change,
    so callers only trim when train=False.
    """
    out_channels: Optional[int] = None
    use_pyramid_pooling: bool = False
    pool_sizes: Optional[Sequence[Tuple[int, int, int]]] = None
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # see models/packed.py; pyramid pooling runs
                               # unpacked (strided pools/resizes don't pack)
                               # and its output is re-packed (a pure reshape)

    @nn.compact
    def __call__(self, x, train: bool = False, drop_front: int = 0):
        k = self.packed_k
        in_channels = x.shape[-1] // k
        out_channels = self.out_channels or in_channels
        half = in_channels // 2
        s = drop_front
        assert 0 <= s < x.shape[1]

        # The reference's three parallel paths (temporal.py:224-244) each start with a
        # 1x1x1 conv+BN+ReLU over the SAME input x, so the three prologs are fused into
        # one (3*half)-channel conv+BN (exact: BN is per-channel, concatenation along
        # channels is identity math). variance_scaling(6.0) on the (1, 1, C, 3*half)
        # kernel reproduces the per-branch kaiming fan_out = half variance.
        # With trimming the prolog needs one leading context frame for the causal
        # (2,3,3) tap: frames [s-1:]; running the causal conv on that slice treats
        # frame s-1 as the sequence start (zero pre-pad), which corrupts only its
        # OWN output frame — dropped below by the [1:] slice.
        # Packed mode: out_parts keeps each path's packed block contiguous, so
        # the per-path slices below stay standard-packed views.
        path_parts = tuple((half, pi * half) for pi in range(3))
        prolog = Conv1x1x1NormActivated(
            3 * half, self.bn_momentum, self.dtype,
            kernel_init=nn.initializers.variance_scaling(6.0, 'fan_out', 'normal'),
            packed_k=k, out_parts=path_parts if k > 1 else None,
            name='prolog_fused')(x[:, s - 1:] if s else x, train)
        paths = []
        for pi, kernel in enumerate([(2, 3, 3), (1, 3, 3)]):
            h = prolog[..., pi * k * half:(pi + 1) * k * half]
            if s and kernel[0] == 1:
                h = h[:, 1:]      # per-frame path: skip the context frame entirely
            h = CausalConv3d(half, kernel, bn_momentum=self.bn_momentum,
                             dtype=self.dtype, packed_k=k)(h, train)
            if s and kernel[0] != 1:
                h = h[:, 1:]      # drop the zero-pre-pad-corrupted context frame
            paths.append(h)
        paths.append(prolog[:, 1:][..., 2 * k * half:3 * k * half] if s
                     else prolog[..., 2 * k * half:3 * k * half])
        h = jnp.concatenate(paths, axis=-1)
        agg_parts = list(path_parts)

        if self.use_pyramid_pooling:
            reduction = in_channels // 3
            px = x[:, s - 1:] if s else x
            if k > 1:
                from fiery_tpu.models.packed import pack_w, unpack_w
                px = unpack_w(px, k)
            pooled = PyramidSpatioTemporalPooling(
                reduction, self.pool_sizes, self.bn_momentum,
                self.dtype)(px, train, drop_front=min(s, 1))
            if k > 1:
                pooled = pack_w(pooled, k)
            for i in range(len(self.pool_sizes)):
                agg_parts.append((reduction, 3 * half + i * reduction))
            h = jnp.concatenate([h, pooled], axis=-1)

        h = Conv1x1x1NormActivated(
            out_channels, self.bn_momentum, self.dtype, packed_k=k,
            in_channels=sum(c for (c, _) in agg_parts),
            in_parts=agg_parts if k > 1 else None)(h, train)

        xs = x[:, s:] if s else x
        if out_channels != in_channels:
            b, t = xs.shape[:2]
            skip = pack_sequence_dim(xs)
            if k > 1:
                from fiery_tpu.models.packed import PackedConv
                skip = PackedConv(out_channels, (1, 1), k=k,
                                  kernel_init=conv_init, dtype=self.dtype,
                                  name='Conv_0')(skip)
            else:
                skip = nn.Conv(out_channels, (1, 1), use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='Conv_0')(skip)
            skip = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                             post='add', packed_k=k, name='BatchNorm_0')(
                                 skip, train, residual=pack_sequence_dim(h))
            return unpack_sequence_dim(skip, b, t)
        return xs + h


class SpatialGRU(nn.Module):
    """Convolutional GRU over a (B, T, H, W, C) sequence; 3x3 conv gates.

    Reference: temporal.py:10-62. The rollout is a short unrolled loop (T <= ~10);
    the same submodules are reused each step, so parameters are shared across time.
    """
    hidden_size: int
    gru_bias_init: float = 0.0
    norm: str = 'bn'
    activation: str = 'relu'
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # >1: x/state/output ride the space-to-channel
                               # packed view (models/packed.py); exact

    @nn.compact
    def __call__(self, x, state=None, train: bool = False):
        k = self.packed_k
        b, t, h, wp, cp = x.shape
        cx, hs = cp // k, self.hidden_size
        # The reference's conv_update and conv_reset (temporal.py:20-25) read the SAME
        # (x_t ++ state) input with identical 3x3 geometry, so they are fused into one
        # conv producing 2*hidden channels (exact: channel-concatenated kernels).
        # variance_scaling(4.0, fan_out) on the (3, 3, C, 2H) kernel reproduces the
        # per-gate kaiming fan_out = 9*H variance of the unfused convs.
        gate_init = nn.initializers.variance_scaling(4.0, 'fan_out', 'normal')
        if k > 1:
            from fiery_tpu.models.packed import PackedConv
            # out_parts puts all update-gate channels first: gates[..., :k*hs]
            # IS the packed update gate, [k*hs:] the packed reset gate
            conv_gates = PackedConv(2 * hs, (3, 3), k=k, use_bias=True,
                                    kernel_init=gate_init, dtype=self.dtype,
                                    in_channels=cx + hs,
                                    in_parts=[(cx, 0), (hs, cx)],
                                    out_parts=[(hs, 0), (hs, hs)],
                                    name='conv_gates')
            conv_state_tilde = ConvBlock(hs, kernel_size=3, bias=False,
                                         norm=self.norm, activation=self.activation,
                                         bn_momentum=self.bn_momentum,
                                         dtype=self.dtype, packed_k=k,
                                         in_channels=cx + hs,
                                         in_parts=[(cx, 0), (hs, cx)],
                                         name='conv_state_tilde')
        else:
            conv_gates = nn.Conv(2 * hs, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)), use_bias=True,
                                 kernel_init=gate_init, name='conv_gates',
                                 dtype=self.dtype)
            conv_state_tilde = ConvBlock(hs, kernel_size=3, bias=False,
                                         norm=self.norm, activation=self.activation,
                                         bn_momentum=self.bn_momentum, dtype=self.dtype,
                                         name='conv_state_tilde')

        rnn_state = (jnp.zeros((b, h, wp, k * hs), dtype=x.dtype)
                     if state is None else state)
        outputs = []
        for i in range(t):
            x_t = x[:, i]
            x_and_state = jnp.concatenate([x_t, rnn_state], axis=-1)
            gates = jax.nn.sigmoid(conv_gates(x_and_state) + self.gru_bias_init)
            update_gate = gates[..., :k * hs]
            reset_gate = gates[..., k * hs:]
            state_tilde = conv_state_tilde(
                jnp.concatenate([x_t, (1.0 - reset_gate) * rnn_state], axis=-1), train)
            rnn_state = (1.0 - update_gate) * rnn_state + update_gate * state_tilde
            outputs.append(rnn_state)
        return jnp.stack(outputs, axis=1)
