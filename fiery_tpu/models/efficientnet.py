"""EfficientNet-b0/b4 backbone (MBConv stack) in flax.linen, NHWC.

From-scratch implementation of the subset of EfficientNet the reference encoder uses
(/root/reference/fiery/models/encoder.py:16-91): stem + blocks truncated at the last
stride-8 stage (block index 10 for b0, 21 for b4), returning the FPN endpoints
(reduction_3 @ stride 8, reduction_4 @ stride 16 of the truncated net). TF-style SAME
padding (the reference's Conv2dStaticSamePadding replicates TF SAME, which is XLA
'SAME'), BN eps 1e-3, swish activations, squeeze-excitation, and per-block
drop-connect rate scaled as rate * idx / n_blocks (encoder.py:68-70).
"""

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiery_tpu.models.layers import BatchNorm, conv_init

# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters, se_ratio)
_BLOCK_ARGS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

# width_coefficient, depth_coefficient, drop_connect_rate
_GLOBAL_PARAMS = {
    'b0': (1.0, 1.0, 0.2),
    'b4': (1.4, 1.8, 0.2),
}


def round_filters(filters, width_coefficient, divisor=8):
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats, depth_coefficient):
    return int(math.ceil(depth_coefficient * repeats))


def block_specs(version):
    """Flat per-block spec list: (kernel, stride, expand, in_ch, out_ch, se_ratio)."""
    width, depth, _ = _GLOBAL_PARAMS[version]
    specs = []
    for repeat, k, s, e, ci, co, se in _BLOCK_ARGS:
        ci_r = round_filters(ci, width)
        co_r = round_filters(co, width)
        n = round_repeats(repeat, depth)
        for i in range(n):
            specs.append((k, s if i == 0 else 1, e, ci_r if i == 0 else co_r, co_r, se))
    return specs


def truncation_index(version, downsample):
    """Index of the last kept block (inclusive) when truncating at the given stride.

    Mirrors the reference's hardcoded cut points (encoder.py:40-47): for downsample 8
    it keeps everything through stage 5 (b0 -> idx 10, b4 -> idx 21); for 16, all blocks.
    """
    width, depth, _ = _GLOBAL_PARAMS[version]
    if downsample == 16:
        return sum(round_repeats(r, depth) for r, *_ in _BLOCK_ARGS) - 1
    assert downsample == 8
    return sum(round_repeats(r, depth) for r, *_ in _BLOCK_ARGS[:5]) - 1


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation and drop-connect.

    packed_k > 1: input/output arrive on the space-to-channel packed
    (H, W/k, k*C) view (models/packed.py). Everything except the depthwise
    conv runs packed — the 1x1 expand/project convs as slot-wise grouped
    convs (SlotwiseConv1x1: identical params AND FLOPs), BN + swish + the
    residual add on the packed view (layers.py packed_k=), SE pooling as the
    equal-count mean of per-slot means. The depthwise conv itself cannot ride
    the slot-major packed layout (its taps cross slots of the same original
    channel, which violates grouped-conv contiguity), so the value unpacks
    around it — a reshape whose HBM cost is the buffer the unpacked path
    writes anyway. Param names/shapes identical to the unpacked path.
    """
    kernel: int
    stride: int
    expand_ratio: int
    out_channels: int
    se_ratio: float
    bn_momentum: float = 0.1
    bn_epsilon: float = 1e-3
    dtype: Optional[Any] = None
    packed_k: int = 1

    @nn.compact
    def __call__(self, x, drop_rate: float = 0.0, train: bool = False):
        k = self.packed_k
        inputs = x
        in_channels = x.shape[-1] // k
        expanded = in_channels * self.expand_ratio
        names = iter(f'Conv_{i}' for i in range(5))

        def conv1x1(features, use_bias, value):
            name = next(names)
            if k > 1:
                from fiery_tpu.models.packed import SlotwiseConv1x1
                return SlotwiseConv1x1(features, k=k, use_bias=use_bias,
                                       kernel_init=conv_init, dtype=self.dtype,
                                       name=name)(value)
            return nn.Conv(features, (1, 1), use_bias=use_bias,
                           kernel_init=conv_init, dtype=self.dtype,
                           name=name)(value)

        # swish activations ride the BN's packed-lane epilogue (layers.py
        # post=: exact, same op order) instead of separate unpacked passes
        if self.expand_ratio != 1:
            x = conv1x1(expanded, False, x)
            x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                          dtype=self.dtype, post='swish', packed_k=k)(x, train)

        # depthwise (unpacked: slot-crossing taps can't be grouped)
        if k > 1:
            from fiery_tpu.models.packed import pack_w, unpack_w
            x = unpack_w(x, k)
        x = nn.Conv(expanded, (self.kernel, self.kernel), strides=(self.stride,) * 2,
                    padding='SAME', feature_group_count=expanded, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name=next(names))(x)
        if k > 1:
            x = pack_w(x, k)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      dtype=self.dtype, post='swish', packed_k=k)(x, train)

        if self.se_ratio and 0 < self.se_ratio <= 1:
            squeezed_ch = max(1, int(in_channels * self.se_ratio))
            if k > 1:
                # equal-count slot means -> exact global spatial mean
                s = jnp.mean(x, axis=(-3, -2), keepdims=True)
                s = jnp.mean(s.reshape(s.shape[:-1] + (k, expanded)), axis=-2)
            else:
                s = jnp.mean(x, axis=(-3, -2), keepdims=True)
            s = nn.Conv(squeezed_ch, (1, 1), use_bias=True, kernel_init=conv_init,
                        dtype=self.dtype, name=next(names))(s)
            s = nn.silu(s)
            s = nn.Conv(expanded, (1, 1), use_bias=True, kernel_init=conv_init,
                        dtype=self.dtype, name=next(names))(s)
            gate = jax.nn.sigmoid(s)
            if k > 1:
                gate = jnp.concatenate([gate] * k, axis=-1)
            x = gate * x

        x = conv1x1(self.out_channels, False, x)
        has_skip = self.stride == 1 and in_channels == self.out_channels
        # the residual add rides the BN epilogue too, except when drop-connect
        # must scale/mask the branch first (train with drop_rate > 0; both are
        # trace-time constants, so the lowering is chosen statically)
        fold_add = has_skip and not (train and drop_rate > 0)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                      dtype=self.dtype, post='add' if fold_add else 'none',
                      packed_k=k)(x, train,
                                  residual=inputs if fold_add else None)

        if has_skip and not fold_add:
            keep = 1.0 - drop_rate
            rng = self.make_rng('dropout')
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = x / keep * mask.astype(x.dtype)
            x = x + inputs
        return x


class EfficientNetFPN(nn.Module):
    """Truncated EfficientNet returning the two FPN endpoints used by the encoder.

    For downsample 8: (reduction_3 @ /8, reduction_4 @ /16-of-truncated-net);
    for 16: (reduction_4, reduction_5). Reference: encoder.py:58-91.
    """
    version: str = 'b4'
    downsample: int = 8
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1   # >1: run the backbone on the space-to-channel packed
                        # view — the C=24..112 stage buffers lane-pad 4-5x in
                        # HBM (CLAUDE.md); see MBConvBlock.packed_k

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, _, drop_connect_rate = _GLOBAL_PARAMS[self.version]
        specs = block_specs(self.version)
        last_idx = truncation_index(self.version, self.downsample)
        n_blocks = last_idx + 1  # reference scales by the truncated length (encoder.py:70)

        pk = self.packed_k
        if pk > 1:
            # every packed width (stem output W/2 and each stride-2 stage
            # below it) must divide by pk; fall back to unpacked otherwise
            w_out = (x.shape[-2] + 1) // 2
            for k_, s_, *_ in specs[:n_blocks]:
                if s_ == 2:
                    w_out = (w_out + 1) // 2
                if w_out % pk:
                    pk = 1
                    break

        # Stem: conv 3x3 s2 + BN + swish
        stem_ch = round_filters(32, width)
        if pk > 1:
            from fiery_tpu.models.packed import PackedConv, unpack_w
            h_in, w_in = x.shape[-3], x.shape[-2]
            # TF SAME padding of a 3x3 s2 conv, per dim: total = k - 1 - (n-1) % 2
            pad = tuple((t // 2, t - t // 2)
                        for t in (2 - (h_in - 1) % 2, 2 - (w_in - 1) % 2))
            x = PackedConv(stem_ch, (3, 3), k=1, k_out=pk, stride=2,
                           padding=pad, kernel_init=conv_init,
                           dtype=self.dtype, name='Conv_0')(x)
        else:
            x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding='SAME',
                        use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name='Conv_0')(x)
        x = BatchNorm(momentum=self.bn_momentum, epsilon=1e-3, dtype=self.dtype,
                      post='swish', packed_k=pk)(x, train)

        endpoints = {}
        prev = x
        for idx in range(n_blocks):
            k, s, e, _, co, se = specs[idx]
            drop = drop_connect_rate * float(idx) / n_blocks
            x = MBConvBlock(kernel=k, stride=s, expand_ratio=e, out_channels=co,
                            se_ratio=se, bn_momentum=self.bn_momentum,
                            dtype=self.dtype, packed_k=pk)(
                                x, drop_rate=drop, train=train)
            if prev.shape[-3] > x.shape[-3]:
                endpoints[f'reduction_{len(endpoints) + 1}'] = prev
            prev = x
        endpoints[f'reduction_{len(endpoints) + 1}'] = x

        if pk > 1:
            endpoints = {name: unpack_w(v, pk) for name, v in endpoints.items()}
        if self.downsample == 16:
            return endpoints['reduction_5'], endpoints['reduction_4']
        return endpoints['reduction_4'], endpoints['reduction_3']
