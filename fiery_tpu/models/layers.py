"""2D building blocks in flax.linen, NHWC layout.

TPU-native re-design of the reference conv layer zoo
(/root/reference/fiery/layers/convolutions.py:9-214). Geometry parity notes:
  * convs use explicit torch-style symmetric padding ((p, p), (p, p)) — XLA 'SAME'
    pads asymmetrically for even inputs under stride 2 and would shift alignment;
  * bilinear resizes use half-pixel centers (= torch align_corners=False);
  * conv kernels use He(fan_out) init, biases zero (torch-resnet style).

All modules take ``train: bool`` to switch BatchNorm between batch stats and running
averages; running stats live in the 'batch_stats' collection. Under jit with a sharded
batch axis, batch statistics are computed over the *global* batch (GSPMD inserts the
cross-replica collectives), which reproduces the reference's sync-BN (train.py:37).
"""

import os
from typing import Any, Optional

import flax.linen as nn
import jax.image
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.ad_checkpoint import checkpoint_name

conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')  # kaiming normal

# Lane-packed BN: evaluate the BN stats + normalize chain on a
# (..., W // k, k*C) bitcast view so the channel (lane) dimension fills whole
# 128-lane vectors. C in {24, 32, 48, 64, 144} pads lanes 1.3-5x at the model's
# BEV/image shapes; the reshape is a pure reinterpretation of contiguous NHWC
# memory (no data movement when XLA keeps the default layout). Exact math
# (verified vs the unpacked path; equal-count group means); measured -4.7% on
# the baseline train step. FIERY_PACKED_BN=0 disables for debugging. Read at
# trace time so a re-jit picks up a flipped flag.
def _packed_bn_enabled():
    return os.environ.get('FIERY_PACKED_BN', '1') == '1'


# Packed-lane BN *epilogue*: apply the activation / residual-add that follows a
# BatchNorm on the SAME (..., W // k, k*C) packed view before unpacking, so the
# whole BN+act(+add) chain computes — and, where XLA keeps the value packed at
# the fusion boundary — stores full 128-lane vectors instead of lane-padded
# (..., C) ones. Exact math: relu/swish are elementwise and the per-channel BN
# coefficients tile across the packed groups; the residual is bitcast to the
# same view. Measured on the full train step (one process, back-to-back):
# dense parity 509.2 -> 491.0 ms (+3.7%), topk8+warp-free combo 392.2 -> 374.3
# (+4.8%) — default ON. FIERY_PACKED_EPILOGUE=0 disables for debugging.
def _packed_epilogue_enabled():
    return os.environ.get('FIERY_PACKED_EPILOGUE', '1') == '1'


def _apply_post(y, post, residual):
    """The op chain a call site would apply after BN, in call-site order."""
    if post == 'none':
        return y
    if post == 'relu':
        return jax.nn.relu(y)
    if post == 'swish':
        return jax.nn.swish(y)
    if post == 'add':
        return y + residual
    if post == 'add_relu':
        return jax.nn.relu(y + residual)
    if post == 'relu_add':
        return jax.nn.relu(y) + residual
    raise ValueError(f'Invalid BN epilogue {post}')


def _bn_pack_factor(C, W):
    """Smallest k with full 128-lane packing: (k*C) % 128 == 0 and W % k == 0."""
    if C % 128 == 0:
        return 1
    for k in (2, 4, 8, 16):
        if (k * C) % 128 == 0 and W % k == 0:
            return k
    return 1


def conv2d(features, kernel_size=3, stride=1, bias=False, name=None, dtype=None):
    p = (kernel_size - 1) // 2
    return nn.Conv(
        features, (kernel_size, kernel_size), strides=(stride, stride),
        padding=((p, p), (p, p)), use_bias=bias, kernel_init=conv_init, name=name,
        dtype=dtype,
    )


class _BNCore(nn.Module):
    """Hand-rolled BatchNorm core (flax-compatible params/stats and numerics).

    Exists so the batch statistics can be tagged with
    ``checkpoint_name('bn_stats')``: under ``jax.checkpoint`` with the
    ``save_only_these_names('bn_stats')`` policy the per-channel mean/var (a few
    hundred floats) are saved across the remat boundary, and the backward replay
    skips every BN reduction pass over the full activation — the single largest
    fusion-time bucket in the train-step TPU trace.
    """
    momentum: float = 0.9      # flax convention: running <- m*running + (1-m)*batch
    epsilon: float = 1e-5
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    dtype: Optional[Any] = None
    post: str = 'none'         # epilogue folded into the BN: see _apply_post
    packed_k: int = 1          # >1: x arrives ALREADY on the space-to-channel
                               # packed view (models/packed.py) with
                               # x.shape[-1] == packed_k * C; params stay (C,)
    packed_parts: Optional[Any] = None   # packed channel layout of x when it
                               # came from a PackedConv with out_parts: tuple
                               # of (Cpart, base) pairs; None = standard s*C+c

    def _part_tile(self, v, k):
        """Expand a per-original-channel vector to the packed channel layout."""
        if self.packed_parts is None:
            return jnp.tile(v, k)
        return jnp.concatenate([jnp.tile(v[b:b + c], k)
                                for (c, b) in self.packed_parts])

    def _part_reduce(self, m, k, C):
        """Mean per-packed-channel (k*C,) -> per-original-channel (C,)."""
        if self.packed_parts is None:
            return m.reshape(k, C).mean(0)
        parts = list(self.packed_parts)
        # parts must tile [0, C) in ascending base order for the concat below
        assert [b for (_, b) in parts] == list(
            np.cumsum([0] + [c for (c, _) in parts[:-1]])), parts
        out, off = [], 0
        for (c, _) in parts:
            out.append(m[off:off + k * c].reshape(k, c).mean(0))
            off += k * c
        return jnp.concatenate(out)

    @nn.compact
    def __call__(self, x, use_running_average: bool, residual=None):
        C = x.shape[-1] // self.packed_k
        # trace-time registry: utils/bn_fold.py needs each BN's epsilon (a module
        # attribute, invisible in the params tree) to fold eval-mode BN into the
        # preceding conv kernel. Python-level write, works under jax.eval_shape.
        from fiery_tpu.utils import bn_fold
        bn_fold.EPS_REGISTRY[self.scope.path] = self.epsilon
        scale = self.param('scale', self.scale_init, (C,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((C,), jnp.float32))

        if self.packed_k > 1:
            k, xp = self.packed_k, x        # already the packed view; the k>1
            # branches below then reshape to x.shape, which is a no-op
        else:
            k = (_bn_pack_factor(C, x.shape[-2])
                 if _packed_bn_enabled() and x.ndim >= 3 else 1)
            xp = (x.reshape(x.shape[:-2] + (x.shape[-2] // k, k * C))
                  if k > 1 else x)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # stats in f32 over all non-channel axes; with a sharded batch under
            # jit these reductions are global (GSPMD collectives) = sync-BN
            axes = tuple(range(xp.ndim - 1))
            xf = xp.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            if k > 1:
                # equal-count groups: mean of per-group means is the exact mean
                mean = self._part_reduce(mean, k, C)
                mean2 = self._part_reduce(mean2, k, C)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            mean = checkpoint_name(mean, 'bn_stats')
            var = checkpoint_name(var, 'bn_stats')
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        dtype = self.dtype or jnp.float32
        mul = (scale * lax.rsqrt(var + self.epsilon)).astype(dtype)
        if k > 1:
            out = ((xp.astype(dtype) - self._part_tile(mean.astype(dtype), k))
                   * self._part_tile(mul, k)
                   + self._part_tile(bias.astype(dtype), k))
            if self.post != 'none' and _packed_epilogue_enabled():
                res = (residual.reshape(xp.shape)
                       if residual is not None else None)
                return _apply_post(out, self.post, res).reshape(x.shape)
            return _apply_post(out.reshape(x.shape), self.post, residual)
        out = (x.astype(dtype) - mean.astype(dtype)) * mul + bias.astype(dtype)
        return _apply_post(out, self.post, residual)


class BatchNorm(nn.Module):
    """BatchNorm with torch momentum convention (running <- (1-m)*running + m*batch).

    Batch statistics are computed in float32 regardless of the compute dtype, so
    mixed precision does not degrade the running stats. The inner module keeps the
    flax ``BatchNorm_0`` name so parameter/stat paths (and therefore checkpoints and
    the torch weight importer) are unchanged.
    """
    momentum: float = 0.1
    epsilon: float = 1e-5
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    dtype: Optional[Any] = None
    post: str = 'none'         # fold the following act/residual-add into the BN
                               # so it can ride the packed-lane view (exact)
    packed_k: int = 1          # see _BNCore.packed_k
    packed_parts: Optional[Any] = None   # see _BNCore.packed_parts

    @nn.compact
    def __call__(self, x, train: bool = False, residual=None):
        return _BNCore(
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            scale_init=self.scale_init,
            dtype=self.dtype,
            post=self.post,
            packed_k=self.packed_k,
            packed_parts=self.packed_parts,
            name='BatchNorm_0',
        )(x, use_running_average=not train, residual=residual)


def resize_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) parity (NHWC)."""
    shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method='linear')


def max_pool_2x2(x):
    """Non-overlapping 2x2 max pool via reshape+max.

    Forward-identical to nn.max_pool((2,2),(2,2)) (the reference Bottleneck
    skip's MaxPool2d, convolutions.py:165-167), but the VJP is an elementwise
    equality-select instead of the select_and_scatter lowering reduce_window
    takes on TPU. MEASURED NEUTRAL (r5 ABAB on the full train step:
    302.5/304.1/302.7/302.9 ms) — the ~1.5 ms/call the r5 trace attributed
    to select_and_scatter was per-op-sync distortion (same lesson as the r3
    label-warp refutation: trace proportions overweight small ops). Default
    stays the reduce_window lowering, whose tie-routing matches the
    reference's MaxPool2d; FIERY_RESHAPE_MAXPOOL=1 selects the reshape form
    (valid subgradients either way; per-window gradient sums identical).
    """
    import os
    if os.environ.get('FIERY_RESHAPE_MAXPOOL', '0') != '1':
        return nn.max_pool(x, (2, 2), strides=(2, 2))
    h2, w2, c = x.shape[-3] // 2, x.shape[-2] // 2, x.shape[-1]
    x = x.reshape(*x.shape[:-3], h2, 2, w2, 2, c)
    return x.max(axis=(-2, -4))


def upsample2x(x):
    return resize_bilinear(x, (2 * x.shape[-3], 2 * x.shape[-2]))


_ACTIVATIONS = {
    'relu': nn.relu,
    'lrelu': lambda x: nn.leaky_relu(x, 0.1),
    'elu': nn.elu,
    'tanh': jnp.tanh,
    'none': None,
}


class ConvBlock(nn.Module):
    """conv (or transposed conv) + optional norm + optional activation.

    Reference: convolutions.py:9-61.
    """
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = 'bn'
    activation: str = 'relu'
    bias: bool = False
    transpose: bool = False
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # >1: x is a space-to-channel packed view
                               # (models/packed.py); output stays packed
    in_channels: Optional[int] = None            # packed mode: original Cin
    in_parts: Optional[Any] = None               # packed mode: input layout

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed_k > 1:
            from fiery_tpu.models.packed import PackedConv
            assert not self.transpose and self.stride == 1 and self.norm == 'bn'
            x = PackedConv(self.out_channels,
                           (self.kernel_size, self.kernel_size),
                           k=self.packed_k, use_bias=self.bias,
                           kernel_init=conv_init, dtype=self.dtype,
                           in_channels=self.in_channels,
                           in_parts=self.in_parts, name='Conv_0')(x)
            fold_act = self.activation == 'relu'
            x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu' if fold_act else 'none',
                          packed_k=self.packed_k)(x, train)
            act = _ACTIVATIONS[self.activation]
            if act is not None and not fold_act:
                x = act(x)
            return x
        if self.transpose:
            x = nn.ConvTranspose(
                self.out_channels, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding='SAME',
                use_bias=self.bias, kernel_init=conv_init, dtype=self.dtype,
            )(x)
        else:
            x = conv2d(self.out_channels, self.kernel_size, self.stride, self.bias,
                       dtype=self.dtype)(x)
        fold_act = self.norm == 'bn' and self.activation == 'relu'
        if self.norm == 'bn':
            x = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                          post='relu' if fold_act else 'none')(x, train)
        elif self.norm == 'in':
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
        elif self.norm != 'none':
            raise ValueError(f'Invalid norm {self.norm}')
        act = _ACTIVATIONS[self.activation]
        if act is not None and not fold_act:
            x = act(x)
        return x


class Bottleneck(nn.Module):
    """1x1 down-project -> kxk conv (optionally strided/transposed) -> 1x1 up-project,
    each followed by BN+ReLU, with a (possibly projected) residual connection.

    Reference: convolutions.py:64-168 (incl. the odd-size right/bottom pad before the
    skip max-pool under downsampling, convolutions.py:165-167).
    """
    out_channels: Optional[int] = None
    kernel_size: int = 3
    upsample: bool = False
    downsample: bool = False
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1          # >1: x is a space-to-channel packed view
                               # (models/packed.py); identity blocks only

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.packed_k > 1:
            return self._packed(x, train)
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        mid = in_channels // 2
        p = (self.kernel_size - 1) // 2

        identity = (out_channels == in_channels and not self.downsample
                    and not self.upsample)
        h = conv2d(mid, 1, 1, dtype=self.dtype)(x)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        if self.upsample:
            h = nn.ConvTranspose(mid, (self.kernel_size, self.kernel_size), strides=(2, 2),
                                 padding='SAME', use_bias=False, kernel_init=conv_init,
                                 dtype=self.dtype)(h)
        elif self.downsample:
            h = conv2d(mid, self.kernel_size, 2, dtype=self.dtype)(h)
        else:
            h = conv2d(mid, self.kernel_size, 1, dtype=self.dtype)(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        h = conv2d(out_channels, 1, 1, dtype=self.dtype)(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu_add' if identity else 'relu')(
                          h, train, residual=x if identity else None)

        if identity:
            return h

        skip = x
        if self.upsample:
            skip = upsample2x(skip)
        elif self.downsample:
            # pad right/bottom if odd so maxpool output matches the strided conv
            ph, pw = skip.shape[-3] % 2, skip.shape[-2] % 2
            if ph or pw:
                skip = jnp.pad(skip, ((0, 0), (0, ph), (0, pw), (0, 0)))
            skip = max_pool_2x2(skip)
        skip = conv2d(out_channels, 1, 1, dtype=self.dtype)(skip)
        return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                         post='add')(skip, train, residual=h)

    def _packed(self, x, train):
        """Identity-residual bottleneck on the packed view: same param tree
        (Conv_0/1/2 + BatchNorm_0/1/2), packed lowering for every conv/BN."""
        from fiery_tpu.models.packed import PackedConv
        k = self.packed_k
        in_channels = x.shape[-1] // k
        out_channels = self.out_channels or in_channels
        assert (out_channels == in_channels and not self.downsample
                and not self.upsample), 'packed Bottleneck: identity form only'
        mid = in_channels // 2
        h = PackedConv(mid, (1, 1), k=k, kernel_init=conv_init,
                       dtype=self.dtype, name='Conv_0')(x)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu', packed_k=k)(h, train)
        h = PackedConv(mid, (self.kernel_size, self.kernel_size), k=k,
                       kernel_init=conv_init, dtype=self.dtype,
                       name='Conv_1')(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu', packed_k=k)(h, train)
        h = PackedConv(out_channels, (1, 1), k=k, kernel_init=conv_init,
                       dtype=self.dtype, name='Conv_2')(h)
        return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                         post='relu_add', packed_k=k)(h, train, residual=x)


class UpsamplingConcat(nn.Module):
    """Bilinear 2x upsample of the first input, concat with skip, 2x (conv+BN+ReLU).

    Reference: convolutions.py:182-200.
    """
    out_channels: int
    scale_factor: int = 2
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x_to_upsample, x, train: bool = False):
        x_to_upsample = resize_bilinear(
            x_to_upsample,
            (self.scale_factor * x_to_upsample.shape[-3],
             self.scale_factor * x_to_upsample.shape[-2]),
        )
        h = jnp.concatenate([x, x_to_upsample], axis=-1)
        h = conv2d(self.out_channels, 3, 1, dtype=self.dtype)(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        h = conv2d(self.out_channels, 3, 1, dtype=self.dtype)(h)
        h = BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                      post='relu')(h, train)
        return h


class UpsamplingAdd(nn.Module):
    """Bilinear 2x upsample + 1x1 conv + BN, added to the skip. Reference: convolutions.py:203-214.

    packed_k > 1: ``x_skip`` is space-to-channel packed (models/packed.py) and
    the output stays packed. ``packed_in`` says ``x`` itself arrives packed; the
    H-axis upsample then runs on the packed view (exact — packing only mixes
    W into C, and bilinear 2x is separable), the W-axis upsample on the
    unpacked view, and the 1x1 conv on the re-packed result.
    """
    out_channels: int
    scale_factor: int = 2
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None
    packed_k: int = 1
    packed_in: bool = False

    @nn.compact
    def __call__(self, x, x_skip, train: bool = False):
        k = self.packed_k
        if k > 1:
            from fiery_tpu.models.packed import PackedConv, pack_w, unpack_w
            sf = self.scale_factor
            if self.packed_in:
                x = resize_bilinear(x, (sf * x.shape[-3], x.shape[-2]))
                x = unpack_w(x, k)
                x = resize_bilinear(x, (x.shape[-3], sf * x.shape[-2]))
            else:
                x = resize_bilinear(x, (sf * x.shape[-3], sf * x.shape[-2]))
            x = pack_w(x, k)
            x = PackedConv(self.out_channels, (1, 1), k=k, kernel_init=conv_init,
                           dtype=self.dtype, name='Conv_0')(x)
            return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                             post='add', packed_k=k,
                             name='BatchNorm_0')(x, train, residual=x_skip)
        x = resize_bilinear(
            x, (self.scale_factor * x.shape[-3], self.scale_factor * x.shape[-2]))
        x = conv2d(self.out_channels, 1, 1, dtype=self.dtype)(x)
        return BatchNorm(momentum=self.bn_momentum, dtype=self.dtype,
                         post='add')(x, train, residual=x_skip)
