"""Temporal (3D) building blocks and the SpatialGRU, NDHWC layout (B, T, H, W, C).

Re-design of the reference temporal layer zoo (/root/reference/fiery/layers/temporal.py).
Causality is enforced by left-padding the time axis; the short rollouts (T in 3..10) are
unrolled python loops that XLA pipelines — no dynamic control flow needed.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from fiery_tpu.models.layers import BatchNorm, ConvBlock, conv2d, conv_init, resize_bilinear


def conv3d(features, kernel_size, bias=False, name=None):
    return nn.Conv(features, tuple(kernel_size), strides=(1, 1, 1),
                   padding=((0, 0), (0, 0), (0, 0)) if kernel_size == (1, 1, 1) else 'VALID',
                   use_bias=bias, kernel_init=conv_init, name=name)


class Conv1x1x1NormActivated(nn.Module):
    """1x1x1 conv + BN + ReLU. Reference: temporal.py:107-117."""
    out_channels: int
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype)(x)
        return nn.relu(BatchNorm(momentum=self.bn_momentum, dtype=self.dtype)(x, train))


class CausalConv3d(nn.Module):
    """3D conv, causal in time (left-pad), symmetric spatial pad, + BN + ReLU.

    Reference: temporal.py:65-85.
    """
    out_channels: int
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kt, kh, kw = self.kernel_size
        dt, dh, dw = self.dilation
        tp = (kt - 1) * dt
        hp = ((kh - 1) * dh) // 2
        wp = ((kw - 1) * dw) // 2
        x = nn.Conv(self.out_channels, self.kernel_size, strides=(1, 1, 1),
                    padding=((tp, 0), (hp, hp), (wp, wp)),
                    kernel_dilation=self.dilation, use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype)(x)
        return nn.relu(BatchNorm(momentum=self.bn_momentum, dtype=self.dtype)(x, train))


def causal_max_pool3d(x, kernel_size=(2, 3, 3)):
    """Max pool, stride 1, causal time padding. Reference: temporal.py:88-104."""
    kt, kh, kw = kernel_size
    pads = ((kt - 1, 0), ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2)
    return nn.max_pool(x, (kt, kh, kw), strides=(1, 1, 1), padding=pads)


class Bottleneck3D(nn.Module):
    """1x1x1 down-project -> causal 3D conv -> 1x1x1 up-project, + residual.

    Reference: temporal.py:120-164.
    """
    out_channels: Optional[int] = None
    kernel_size: Tuple[int, int, int] = (2, 3, 3)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        mid = in_channels // 2
        h = Conv1x1x1NormActivated(mid, self.bn_momentum, self.dtype)(x, train)
        h = CausalConv3d(mid, self.kernel_size, self.dilation, self.bn_momentum,
                         self.dtype)(h, train)
        h = Conv1x1x1NormActivated(out_channels, self.bn_momentum, self.dtype)(h, train)
        if out_channels != in_channels:
            skip = nn.Conv(out_channels, (1, 1, 1), use_bias=False, kernel_init=conv_init,
                           dtype=self.dtype)(x)
            skip = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype)(skip, train)
        else:
            skip = x
        return h + skip


def _causal_avg_pool3d(x, pool_size):
    """AvgPool3d(kernel=pool, stride=(1, ph, pw), time pad 1 both sides,
    count_include_pad=False) with the last time step dropped -> causal 2-frame average.

    Reference: temporal.py:186-192, 207.
    """
    kt, ph, pw = pool_size
    window = (1, kt, ph, pw, 1)
    strides = (1, 1, ph, pw, 1)
    padding = ((0, 0), (kt - 1, kt - 1), (0, 0), (0, 0), (0, 0))
    sums = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    counts = lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, lax.add,
                               window, strides, padding)
    out = sums / counts
    if kt > 1:
        out = out[:, :-(kt - 1)]
    return out


class PyramidSpatioTemporalPooling(nn.Module):
    """Causal spatio-temporal pyramid pooling: per pool size, average-pool (time kernel 2),
    1x1x1 conv+BN+ReLU, bilinear-upsample back to (H, W); concat over pyramid levels.

    Reference: temporal.py:167-215.
    """
    reduction_channels: int
    pool_sizes: Sequence[Tuple[int, int, int]]
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, _ = x.shape
        out = []
        for pool_size in self.pool_sizes:
            assert pool_size[0] == 2, 'time kernel must be 2 (reference constraint)'
            pooled = _causal_avg_pool3d(x, pool_size)
            pooled = Conv1x1x1NormActivated(self.reduction_channels, self.bn_momentum,
                                            self.dtype)(pooled, train)
            pooled = resize_bilinear(pooled, (h, w))
            out.append(pooled)
        return jnp.concatenate(out, axis=-1)


class TemporalBlock(nn.Module):
    """Parallel causal conv paths (2x3x3, 1x3x3, 1x1x1) + optional pyramid pooling,
    aggregated by a 1x1x1 conv, with a residual connection.

    Reference: temporal.py:218-281.
    """
    out_channels: Optional[int] = None
    use_pyramid_pooling: bool = False
    pool_sizes: Optional[Sequence[Tuple[int, int, int]]] = None
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        half = in_channels // 2

        paths = []
        for kernel in [(2, 3, 3), (1, 3, 3)]:
            h = Conv1x1x1NormActivated(half, self.bn_momentum, self.dtype)(x, train)
            h = CausalConv3d(half, kernel, bn_momentum=self.bn_momentum,
                             dtype=self.dtype)(h, train)
            paths.append(h)
        paths.append(Conv1x1x1NormActivated(half, self.bn_momentum, self.dtype)(x, train))
        h = jnp.concatenate(paths, axis=-1)

        if self.use_pyramid_pooling:
            reduction = in_channels // 3
            pooled = PyramidSpatioTemporalPooling(reduction, self.pool_sizes,
                                                  self.bn_momentum, self.dtype)(x, train)
            h = jnp.concatenate([h, pooled], axis=-1)

        h = Conv1x1x1NormActivated(out_channels, self.bn_momentum, self.dtype)(h, train)

        if out_channels != in_channels:
            skip = nn.Conv(out_channels, (1, 1, 1), use_bias=False, kernel_init=conv_init,
                           dtype=self.dtype)(x)
            skip = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype)(skip, train)
        else:
            skip = x
        return skip + h


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

    @nn.compact
    def __call__(self, x, state=None, train: bool = False):
        b, t, h, w, _ = x.shape
        conv_update = conv2d(self.hidden_size, 3, 1, bias=True, name='conv_update',
                             dtype=self.dtype)
        conv_reset = conv2d(self.hidden_size, 3, 1, bias=True, name='conv_reset',
                            dtype=self.dtype)
        conv_state_tilde = ConvBlock(self.hidden_size, kernel_size=3, bias=False,
                                     norm=self.norm, activation=self.activation,
                                     bn_momentum=self.bn_momentum, dtype=self.dtype,
                                     name='conv_state_tilde')

        rnn_state = (jnp.zeros((b, h, w, self.hidden_size), dtype=x.dtype)
                     if state is None else state)
        outputs = []
        for i in range(t):
            x_t = x[:, i]
            x_and_state = jnp.concatenate([x_t, rnn_state], axis=-1)
            update_gate = jax.nn.sigmoid(conv_update(x_and_state) + self.gru_bias_init)
            reset_gate = jax.nn.sigmoid(conv_reset(x_and_state) + self.gru_bias_init)
            state_tilde = conv_state_tilde(
                jnp.concatenate([x_t, (1.0 - reset_gate) * rnn_state], axis=-1), train)
            rnn_state = (1.0 - update_gate) * rnn_state + update_gate * state_tilde
            outputs.append(rnn_state)
        return jnp.stack(outputs, axis=1)
