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

    @nn.compact
    def __call__(self, x, hidden_state, train: bool = False):
        # x: (b, n_future, h, w, c_in) latent samples; hidden_state: (b, h, w, c)
        for _ in range(self.n_gru_blocks):
            x = SpatialGRU(self.in_channels, bn_momentum=self.bn_momentum,
                           dtype=self.dtype)(x, hidden_state, train=train)
            b, n_future = x.shape[:2]
            x = pack_sequence_dim(x)
            for _ in range(self.n_res_layers):
                x = Bottleneck(bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
            x = unpack_sequence_dim(x, b, n_future)
        return x
