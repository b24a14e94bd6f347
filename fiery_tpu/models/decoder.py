"""BEV decoder: resnet18-style trunk (layers 1-3, random init, zero-init residual BN)
with UpsamplingAdd skip stages and the four output heads.

Reference: /root/reference/fiery/models/decoder.py:7-91 (trunk built from
torchvision resnet18; re-implemented here as BasicBlocks in flax).
Output heads are channels-last: segmentation (n_classes), instance_center (1, sigmoid),
instance_offset (2), instance_flow (2, optional).
"""

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fiery_tpu.models.layers import BatchNorm, UpsamplingAdd, conv2d, conv_init
from fiery_tpu.utils.geometry import pack_sequence_dim, unpack_sequence_dim


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock with zero-initialised second BN scale."""
    channels: int
    stride: int = 1
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
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


class FusedHeads(nn.Module):
    """The four output heads (reference decoder.py:25-51) fused into one trunk.

    Each reference head is conv3x3(C -> C) + BN + ReLU + conv1x1(C -> out). The four
    3x3 convs read the SAME input, so they are one conv3x3(C -> 4C) + one BN(4C)
    (exact: BN is per-channel; channel concatenation is identity math), followed by
    per-head 1x1 convs on their channel slices. variance_scaling(2.0 * n_heads) on
    the fused (3, 3, C, n_heads*C) kernel reproduces the per-head kaiming
    fan_out = 9*C variance.
    """
    head_channels: Sequence[int]     # output channels per head
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.head_channels)
        C = x.shape[-1]
        init = nn.initializers.variance_scaling(2.0 * n, 'fan_out', 'normal')
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (b, s, h, w, c)
        b, s = x.shape[:2]
        shared_out_channels = x.shape[-1]
        x = pack_sequence_dim(x)

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
