"""Future state rollout: stacked [SpatialGRU -> Bottleneck x n] blocks.

Reference: /root/reference/fiery/models/future_prediction.py:7-36.
"""

from typing import Any, Optional

import flax.linen as nn

from fiery_tpu.models.layers import Bottleneck
from fiery_tpu.models.temporal_layers import SpatialGRU
from fiery_tpu.utils.geometry import pack_sequence_dim, unpack_sequence_dim


class FuturePrediction(nn.Module):
    in_channels: int
    n_gru_blocks: int = 3
    n_res_layers: int = 3
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1   # >1: run the whole rollout on the space-to-channel
                        # packed view (models/packed.py) — exact, same params;
                        # C=64 BEV buffers then fill whole 128-lane vectors
    packed_k_eval: Optional[int] = None  # packing at train=False; None = same

    @nn.compact
    def __call__(self, x, hidden_state, train: bool = False):
        # x: (b, n_future, h, w, c_in) latent samples; hidden_state: (b, h, w, c)
        k = self.packed_k if (train or self.packed_k_eval is None) \
            else self.packed_k_eval
        if k > 1:
            from fiery_tpu.models.packed import pack_w, unpack_w
            x, hidden_state = pack_w(x, k), pack_w(hidden_state, k)
        for _ in range(self.n_gru_blocks):
            x = SpatialGRU(self.in_channels, bn_momentum=self.bn_momentum,
                           dtype=self.dtype, packed_k=k)(x, hidden_state, train=train)
            b, n_future = x.shape[:2]
            x = pack_sequence_dim(x)
            for _ in range(self.n_res_layers):
                x = Bottleneck(bn_momentum=self.bn_momentum, dtype=self.dtype,
                               packed_k=k)(x, train)
            x = unpack_sequence_dim(x, b, n_future)
        if k > 1:
            from fiery_tpu.models.packed import unpack_w
            x = unpack_w(x, k)
        return x
