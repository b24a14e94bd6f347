"""Image encoder: EfficientNet FPN + categorical-depth lifting head.

Reference: /root/reference/fiery/models/encoder.py:7-104. Input NHWC (B, H, W, 3);
output the lifted camera volume (B, h, w, D, C) where h, w = H, W / downsample —
kept in the head's natural memory order (lift_splat aligns bin ids to it instead of
materialising the reference's (C, D, h, w) permute).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fiery_tpu.models.efficientnet import EfficientNetFPN
from fiery_tpu.models.layers import UpsamplingConcat, conv_init
from fiery_tpu.ops.lift_splat import depth_feature_outer_product


class Encoder(nn.Module):
    out_channels: int         # C (cfg.MODEL.ENCODER.OUT_CHANNELS)
    depth_channels: int       # D (from LIFT.D_BOUND)
    version: str = 'b4'
    downsample: int = 8
    use_depth_distribution: bool = True
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False, split_depth: bool = False):
        """split_depth=True returns (depth_softmax (B,h,w,D), features (B,h,w,C))
        instead of the dense outer-product volume — the sparse top-k splat
        (ops/lift_splat.py lift_splat_topk) selects depth bins before lifting."""
        C, D = self.out_channels, self.depth_channels
        # FIERY_PACKED_ENCODER=k runs the EfficientNet backbone on the
        # space-to-channel packed view (efficientnet.py MBConvBlock.packed_k;
        # exact, same params). Read at trace time like the other FIERY_PACKED_*
        # flags — use a fresh jit after flipping it.
        import os
        packed_k = max(1, int(os.environ.get('FIERY_PACKED_ENCODER', '0') or 0))
        feat_hi, feat_lo = EfficientNetFPN(
            version=self.version, downsample=self.downsample,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            packed_k=packed_k)(x, train)
        upsampling_out = 512 if self.downsample == 16 else 128
        x = UpsamplingConcat(upsampling_out, bn_momentum=self.bn_momentum,
                             dtype=self.dtype)(feat_hi, feat_lo, train)

        head_channels = C + D if self.use_depth_distribution else C
        x = nn.Conv(head_channels, (1, 1), use_bias=True, kernel_init=conv_init,
                    name='depth_layer', dtype=self.dtype)(x)

        if self.use_depth_distribution:
            if split_depth:
                return jax.nn.softmax(x[..., :D], axis=-1), x[..., D:D + C]
            return depth_feature_outer_product(x, D, C)   # (B, h, w, D, C)
        if split_depth:
            return (jnp.full((*x.shape[:-1], D), 1.0, x.dtype), x)
        # no depth distribution: replicate features along D (encoder.py:102)
        return jnp.broadcast_to(x[..., None, :], (*x.shape[:-1], D, x.shape[-1]))
