"""Temporal models over BEV state sequences (B, T, H, W, C).

Reference: /root/reference/fiery/models/temporal_model.py. The NDHWC layout means no
permutes are needed around the 3D convs (the reference shuffles to channels-first).
"""

from typing import Any, Optional, Tuple

import flax.linen as nn

from fiery_tpu.models.temporal_layers import Bottleneck3D, TemporalBlock


def temporal_out_channels(name, in_channels, receptive_field, start_out_channels=64,
                          extra_in_channels=0):
    """Static output-channel computation (needed to size downstream modules)."""
    if name == 'identity':
        return in_channels
    n_layers = receptive_field - 1
    if n_layers == 0:
        return in_channels
    return start_out_channels + extra_in_channels * max(0, n_layers - 1)


class TemporalModelIdentity(nn.Module):
    """Pass-through keeping only frames >= receptive_field - 1. Reference: temporal_model.py:55-62."""
    receptive_field: int

    def __call__(self, x, train: bool = False):
        return x[:, self.receptive_field - 1:]


class TemporalModel(nn.Module):
    """Stack of receptive_field-1 TemporalBlocks (+ optional spatial Bottleneck3Ds).

    Reference: temporal_model.py:6-52.
    """
    receptive_field: int
    input_shape: Tuple[int, int]       # (H, W) of the BEV grid
    start_out_channels: int = 64
    extra_in_channels: int = 0
    n_spatial_layers_between_temporal_layers: int = 0
    use_pyramid_pooling: bool = True
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # >1: run the block stack on the space-to-channel
                               # packed view (models/packed.py) — exact, same
                               # params; fills the C=35 mid-channel lanes
    packed_k_eval: Optional[int] = None   # packing at train=False; None = same
                               # as packed_k (the lowering is exact either way,
                               # so train/eval may differ; BN-folded serving
                               # graphs measured FASTER unpacked)

    @nn.compact
    def __call__(self, x, train: bool = False, trim: bool = False):
        # trim=True: only the present frame (index receptive_field-1) survives the
        # final slice, and every temporal kernel has extent 2, so each TemporalBlock
        # needs to emit exactly one output frame fewer than its input has
        # (drop_front=1) — the stack converges to a single frame instead of
        # computing receptive_field frames and discarding all but one. Exact when
        # BatchNorm uses running statistics (eval); with train=True the BN batch
        # statistics are computed over the trimmed frames only — the discarded
        # frames influenced training solely through those statistics, so this is
        # an off-parity approximation (cfg MODEL.TEMPORAL_MODEL.TRIM_TRAIN).
        h, w = self.input_shape
        k = self.packed_k if (train or self.packed_k_eval is None) \
            else self.packed_k_eval
        if k > 1:
            from fiery_tpu.models.packed import pack_w, unpack_w
            x = pack_w(x, k)
        block_out_channels = self.start_out_channels
        for _ in range(self.receptive_field - 1):
            pool_sizes = [(2, h, w)] if self.use_pyramid_pooling else None
            x = TemporalBlock(
                out_channels=block_out_channels,
                use_pyramid_pooling=self.use_pyramid_pooling,
                pool_sizes=pool_sizes,
                bn_momentum=self.bn_momentum,
                dtype=self.dtype,
                packed_k=k,
            )(x, train, drop_front=1 if trim else 0)
            for _ in range(self.n_spatial_layers_between_temporal_layers):
                x = Bottleneck3D(block_out_channels, kernel_size=(1, 3, 3),
                                 bn_momentum=self.bn_momentum, dtype=self.dtype,
                                 packed_k=k)(x, train)
            block_out_channels += self.extra_in_channels
        if k > 1:
            x = unpack_w(x, k)
        return x if trim else x[:, self.receptive_field - 1:]
