"""Present/future latent distribution modules (CVAE-style diagonal Gaussians).

Reference: /root/reference/fiery/models/distributions.py:7-56.
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from fiery_tpu.models.layers import Bottleneck, conv_init


class DistributionEncoder(nn.Module):
    """Four downsampling Bottlenecks. Reference: distributions.py:42-56."""
    out_channels: int
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(4):
            x = Bottleneck(out_channels=self.out_channels, downsample=True,
                           bn_momentum=self.bn_momentum, dtype=self.dtype)(x, train)
        return x


class DistributionModule(nn.Module):
    """Parametrises a diagonal Gaussian over the latent: returns (mu, log_sigma),
    each (b, 1, latent_dim), with log_sigma clamped. Reference: distributions.py:7-39.
    """
    latent_dim: int
    min_log_sigma: float = -5.0
    max_log_sigma: float = 5.0
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, s_t, train: bool = False):
        # s_t: (b, 1, h, w, c)
        b, s = s_t.shape[:2]
        assert s == 1
        compress_dim = s_t.shape[-1] // 2
        encoding = DistributionEncoder(compress_dim, self.bn_momentum,
                                       self.dtype)(s_t[:, 0], train)
        pooled = jnp.mean(encoding, axis=(-3, -2), keepdims=True)   # AdaptiveAvgPool2d(1)
        mu_log_sigma = nn.Conv(2 * self.latent_dim, (1, 1), use_bias=True,
                               kernel_init=conv_init, dtype=self.dtype)(pooled)
        mu_log_sigma = mu_log_sigma.reshape(b, 1, 2 * self.latent_dim)
        mu_log_sigma = mu_log_sigma.astype(jnp.float32)
        mu = mu_log_sigma[..., :self.latent_dim]
        log_sigma = jnp.clip(mu_log_sigma[..., self.latent_dim:],
                             self.min_log_sigma, self.max_log_sigma)
        return mu, log_sigma
