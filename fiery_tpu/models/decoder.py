"""BEV decoder: resnet18-style trunk (layers 1-3, random init, zero-init residual BN)
with UpsamplingAdd skip stages and the four output heads.

Reference: /root/reference/fiery/models/decoder.py:7-91 (trunk built from
torchvision resnet18; re-implemented here as BasicBlocks in flax).
Output heads are channels-last: segmentation (n_classes), instance_center (1, sigmoid),
instance_offset (2), instance_flow (2, optional).

packed_k > 1 runs the C=64 stages (input/skip1 at full BEV resolution, layer1 at
half resolution, the head trunk) on the space-to-channel packed view
(models/packed.py) — exact same math and parameter tree; stride-2 transitions
use the mixed-pack strided kernel lowering (pack_kernel_strided). The C>=128
stages (layer2/3 and their upsamples) already fill whole 128-lane vectors and
run unpacked.
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fiery_tpu.models.layers import (BatchNorm, UpsamplingAdd, conv2d,
                                     conv_init, resize_bilinear)
from fiery_tpu.utils.geometry import pack_sequence_dim, unpack_sequence_dim


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock with zero-initialised second BN scale.

    packed_k > 1: input arrives space-to-channel packed. With stride == 1 the
    output stays packed; with stride == 2 the block UNPACKS (k_out=1) through
    the strided conv + projection, so the C>=128 downstream stages run on the
    plain view.
    """
    channels: int
    stride: int = 1
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.packed_k
        if k > 1:
            from fiery_tpu.models.packed import PackedConv
            in_channels = x.shape[-1] // k
            k_out = 1 if self.stride != 1 else k
            project = self.stride != 1 or in_channels != self.channels
            h = PackedConv(self.channels, (3, 3), k=k, kernel_init=conv_init,
                           dtype=self.dtype, stride=self.stride, k_out=k_out,
                           name='Conv_0')(x)
            h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu', packed_k=k_out, name='BatchNorm_0')(h, train)
            if k_out > 1:
                h = PackedConv(self.channels, (3, 3), k=k_out,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='Conv_1')(h)
            else:
                h = conv2d(self.channels, 3, 1, dtype=self.dtype,
                           name='Conv_1')(h)
            h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          scale_init=nn.initializers.zeros,
                          post='none' if project else 'add_relu',
                          packed_k=k_out, name='BatchNorm_1')(
                              h, train, residual=None if project else x)
            if project:
                identity = PackedConv(self.channels, (1, 1), k=k,
                                      kernel_init=conv_init, dtype=self.dtype,
                                      stride=self.stride, k_out=k_out,
                                      name='Conv_2')(x)
                return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                                 post='add_relu', packed_k=k_out,
                                 name='BatchNorm_2')(identity, train, residual=h)
            return h

        project = self.stride != 1 or x.shape[-1] != self.channels
        h = conv2d(self.channels, 3, self.stride, dtype=self.dtype)(x)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        h = conv2d(self.channels, 3, 1, dtype=self.dtype)(h)
        # zero_init_residual: the block starts as identity (decoder.py:10);
        # the closing relu(h + identity) folds into whichever BN comes last
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      scale_init=nn.initializers.zeros,
                      post='none' if project else 'add_relu')(
                          h, train, residual=None if project else x)
        if project:
            identity = conv2d(self.channels, 1, self.stride, dtype=self.dtype)(x)
            return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                             post='add_relu')(identity, train, residual=h)
        return h


class _HeadParams(nn.Module):
    """Declares the 'kernel'/'bias' parameters of a 1x1 nn.Conv head without
    running it — same shapes, names, and initialisers, so the parameter tree is
    byte-identical with the unpacked FusedHeads path."""
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', conv_init,
                            (1, 1, self.in_channels, self.out_channels),
                            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        return kernel, bias


class FusedHeads(nn.Module):
    """The four output heads (reference decoder.py:25-51) fused into one trunk.

    Each reference head is conv3x3(C -> C) + BN + ReLU + conv1x1(C -> out). The four
    3x3 convs read the SAME input, so they are one conv3x3(C -> 4C) + one BN(4C)
    (exact: BN is per-channel; channel concatenation is identity math), followed by
    per-head 1x1 convs on their channel slices. variance_scaling(2.0 * n_heads) on
    the fused (3, 3, C, n_heads*C) kernel reproduces the per-head kaiming
    fan_out = 9*C variance.

    packed_k > 1: the trunk conv + BN + per-head 1x1s all run on the packed
    view (the fused trunk uses out_parts so each head's packed block stays a
    contiguous slice); head outputs are unpacked before returning.
    """
    head_channels: Sequence[int]     # output channels per head
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.head_channels)
        k = self.packed_k
        C = x.shape[-1] // k
        init = nn.initializers.variance_scaling(2.0 * n, 'fan_out', 'normal')
        if k > 1:
            from fiery_tpu.models.packed import (pack_kernel, packed_bias_index,
                                                 PackedConv, unpack_w)
            from jax import lax
            trunk_parts = tuple((C, i * C) for i in range(n))
            h = PackedConv(n * C, (3, 3), k=k, kernel_init=init,
                           dtype=self.dtype, out_parts=trunk_parts,
                           name='conv_fused')(x)
            h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu', packed_k=k, packed_parts=trunk_parts,
                          name='BatchNorm_0')(h, train)
            # The four per-head 1x1 convs each read one C-slice of h and write a
            # 1-2 channel buffer that is lane-padded up to 64x in HBM. Evaluate
            # them as ONE packed conv with a block-diagonal (n*C -> sum(out))
            # kernel assembled at trace time from the per-head parameters
            # (exact: the zero cross-blocks contribute exact 0.0) — one output
            # buffer instead of four. _HeadParams declares kernel/bias under
            # the same 'out_i' scopes as the unpacked nn.Conv heads.
            total = sum(self.head_channels)
            dtype = self.dtype or h.dtype
            fused = jnp.zeros((1, 1, n * C, total), jnp.float32)
            bias = jnp.zeros((total,), jnp.float32)
            off = 0
            for i, out_channels in enumerate(self.head_channels):
                kern_i, bias_i = _HeadParams(C, out_channels, name=f'out_{i}')()
                fused = fused.at[:, :, i * C:(i + 1) * C,
                                 off:off + out_channels].set(kern_i)
                bias = bias.at[off:off + out_channels].set(bias_i)
                off += out_channels
            head_parts = []
            off = 0
            for out_channels in self.head_channels:
                head_parts.append((out_channels, off))
                off += out_channels
            pk, _ = pack_kernel(fused.astype(dtype), k,
                                in_parts=trunk_parts,
                                out_parts=head_parts)
            y = lax.conv_general_dilated(
                h.astype(dtype), pk, window_strides=(1, 1),
                padding=((0, 0), (0, 0)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            y = y + bias.astype(dtype)[jnp.asarray(
                packed_bias_index(k, total, head_parts))]
            outs = []
            off = 0
            for out_channels in self.head_channels:
                outs.append(unpack_w(y[..., off * k:(off + out_channels) * k], k))
                off += out_channels
            return outs
        h = nn.Conv(n * C, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=init, dtype=self.dtype,
                    name='conv_fused')(x)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        outs = []
        for i, out_channels in enumerate(self.head_channels):
            outs.append(nn.Conv(out_channels, (1, 1), use_bias=True,
                                kernel_init=conv_init, dtype=self.dtype,
                                name=f'out_{i}')(h[..., i * C:(i + 1) * C]))
        return outs


class Decoder(nn.Module):
    n_classes: int = 2
    predict_future_flow: bool = True
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # see models/packed.py; module docstring above
    packed_k_eval: Optional[int] = None   # packing at train=False; None = same

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, s, h, w, c)
        b, s = x.shape[:2]
        shared_out_channels = x.shape[-1]
        x = pack_sequence_dim(x)
        k = self.packed_k if (train or self.packed_k_eval is None) \
            else self.packed_k_eval
        if k > 1 and x.shape[-2] % (4 * k) == 0:
            from fiery_tpu.models.packed import PackedConv, pack_w
            x = pack_w(x, k)

            skip1 = x
            h = PackedConv(64, (7, 7), k=k, kernel_init=conv_init,
                           dtype=self.dtype, stride=2, k_out=k,
                           name='Conv_0')(x)            # (H/2, W/2) packed
            h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu', packed_k=k, name='BatchNorm_0')(h, train)

            # layer1 (packed, stride 1)
            h = BasicBlock(64, 1, self.bn_momentum, self.dtype, packed_k=k)(h, train)
            h = BasicBlock(64, 1, self.bn_momentum, self.dtype, packed_k=k)(h, train)
            skip2 = h                                    # packed (H/2, W/2k, k*64)
            # layer2 -> (H/4, W/4): the strided block unpacks (C=128 fills lanes)
            h = BasicBlock(128, 2, self.bn_momentum, self.dtype, packed_k=k)(h, train)
            h = BasicBlock(128, 1, self.bn_momentum, self.dtype)(h, train)
            skip3 = h
            # layer3 -> (H/8, W/8)
            h = BasicBlock(256, 2, self.bn_momentum, self.dtype)(h, train)
            h = BasicBlock(256, 1, self.bn_momentum, self.dtype)(h, train)

            h = UpsamplingAdd(128, bn_momentum=self.bn_momentum,
                              dtype=self.dtype)(h, skip3, train)
            h = UpsamplingAdd(64, bn_momentum=self.bn_momentum, dtype=self.dtype,
                              packed_k=k)(h, skip2, train)        # packs h, adds packed skip
            h = UpsamplingAdd(shared_out_channels, bn_momentum=self.bn_momentum,
                              dtype=self.dtype, packed_k=k,
                              packed_in=True)(h, skip1, train)

            head_channels = ([self.n_classes, 1, 2]
                             + ([2] if self.predict_future_flow else []))
            heads = FusedHeads(head_channels, self.bn_momentum, self.dtype,
                               packed_k=k, name='heads')(h, train)
        else:
            skip1 = x
            h = conv2d(64, 7, 2, dtype=self.dtype)(x)     # (H/2, W/2)
            h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu')(h, train)

            # layer1 (note: no maxpool before layer1 in the reference decoder)
            h = BasicBlock(64, 1, self.bn_momentum, self.dtype)(h, train)
            h = BasicBlock(64, 1, self.bn_momentum, self.dtype)(h, train)
            skip2 = h
            # layer2 -> (H/4, W/4)
            h = BasicBlock(128, 2, self.bn_momentum, self.dtype)(h, train)
            h = BasicBlock(128, 1, self.bn_momentum, self.dtype)(h, train)
            skip3 = h
            # layer3 -> (H/8, W/8)
            h = BasicBlock(256, 2, self.bn_momentum, self.dtype)(h, train)
            h = BasicBlock(256, 1, self.bn_momentum, self.dtype)(h, train)

            h = UpsamplingAdd(128, bn_momentum=self.bn_momentum, dtype=self.dtype)(h, skip3, train)
            h = UpsamplingAdd(64, bn_momentum=self.bn_momentum, dtype=self.dtype)(h, skip2, train)
            h = UpsamplingAdd(shared_out_channels, bn_momentum=self.bn_momentum,
                              dtype=self.dtype)(h, skip1, train)

            head_channels = [self.n_classes, 1, 2] + ([2] if self.predict_future_flow else [])
            heads = FusedHeads(head_channels, self.bn_momentum, self.dtype,
                               name='heads')(h, train)
        segmentation = heads[0]
        instance_center = nn.sigmoid(heads[1])
        instance_offset = heads[2]
        instance_flow = heads[3] if self.predict_future_flow else None

        out = {
            'segmentation': unpack_sequence_dim(segmentation, b, s),
            'instance_center': unpack_sequence_dim(instance_center, b, s),
            'instance_offset': unpack_sequence_dim(instance_offset, b, s),
            'instance_flow': (unpack_sequence_dim(instance_flow, b, s)
                              if instance_flow is not None else None),
        }
        return out
