"""Space-to-channel "packed" convolutions: run C<128 BEV stages on a
(H, W/k, k*C) view so every HBM buffer fills whole 128-lane vectors.

Why: TPU tiles the minor (channel) dimension to 128 lanes, so a C=64 bf16
buffer occupies 2x its logical bytes in HBM and every elementwise/BN fusion
over it runs at half the achievable bandwidth (measured 250-400 GB/s vs 819
peak on the big BEV fusions — CLAUDE.md). The packed-lane BN (layers.py)
already evaluates the BN+epilogue math on this view, but the values still
unpack to (H, W, C) at every conv boundary because the convs themselves
consume the unpacked layout. Here the convs run IN the packed view:

  A stride-1 KxK conv on (H, W, C) is exactly a KxKp conv on (H, W/k, k*C)
  with a block-sparse kernel: output slot s at packed column x' is original
  column k*x'+s, whose tap dx reads original column k*x'+s+dx = packed
  column x'+q, slot r, where  dx = k*q + r - s.  Packing the kernel is a
  trace-time rearrangement of the ORIGINAL (Kh, Kw, Cin, Cout) parameter —
  the parameter tree, init, and checkpoint layout are identical to the
  unpacked modules; only the lowering changes.

Cost: the packed kernel has k x the taps (mostly zero blocks), so conv FLOPs
grow ~k-fold — irrelevant here (the train step runs at ~6% MFU; the MXU is
idle), while conv/BN/elementwise HBM bytes shrink toward the unpadded size.

This replaces the reference's plain NCHW convs (/root/reference/fiery/layers/
convolutions.py:9-61, temporal.py:10-62) for the C=64 BEV-resolution stages;
there is no reference analogue (CUDA does not lane-pad).

Value-packing convention: packed channel j of a (H, W/k, k*C) tensor holds
original (column-slot s, channel c) with j = s*C + c — i.e. the packed view
IS reshape(H, W/k, k*C) of the contiguous NHWC array (a bitcast, no data
movement), matching layers._BNCore's packed-lane view.
"""

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pack_w(x, k):
    """(…, H, W, C) -> (…, H, W/k, k*C) packed view (pure reshape)."""
    if k == 1:
        return x
    assert x.shape[-2] % k == 0, (x.shape, k)
    return x.reshape(x.shape[:-2] + (x.shape[-2] // k, k * x.shape[-1]))


def unpack_w(x, k):
    """Inverse of pack_w."""
    if k == 1:
        return x
    assert x.shape[-1] % k == 0, (x.shape, k)
    return x.reshape(x.shape[:-2] + (x.shape[-2] * k, x.shape[-1] // k))


def pack_kernel(kernel, k, in_parts=None, out_parts=None):
    """Rearrange an original (Kh, Kw, Cin, Cout) conv kernel into the packed
    (Kh, Kw_p, k*Cin, k*Cout) kernel for a stride-1 conv on the packed view.

    in_parts / out_parts describe the packed channel layout of the conv's
    input / output as a concatenation of independently packed blocks: each
    part (Cpart, base) contributes k*Cpart consecutive packed channels
    holding ORIGINAL channels [base, base + Cpart) in s*Cpart + c order.
      * in_parts covers channel-concats of packed tensors (e.g. the GRU's
        concat([x, state])); default: one part [(Cin, 0)].
      * out_parts lets a caller split the packed output into meaningful
        contiguous slices (e.g. GRU gates: part (H, 0) = all update-gate
        channels, part (H, H) = all reset-gate channels, so
        out[..., :k*H] IS the packed update gate); default: [(Cout, 0)].

    Returns (packed_kernel, (left, right)) where the pads reproduce the
    original symmetric padding p = (Kw-1)//2 on the packed column axis.
    """
    Kh, Kw, Cin, Cout = kernel.shape
    p = (Kw - 1) // 2
    assert Kw == 2 * p + 1, 'stride-1 packed conv expects odd kernel width'
    qL = -(-p // k)                      # ceil(p/k)
    qR = (k - 1 + p) // k
    Kw_p = qL + qR + 1
    in_parts = list(in_parts) if in_parts is not None else [(Cin, 0)]
    out_parts = list(out_parts) if out_parts is not None else [(Cout, 0)]
    assert sum(cp for cp, _ in in_parts) == Cin, (in_parts, Cin)
    assert sum(cp for cp, _ in out_parts) == Cout, (out_parts, Cout)

    out = jnp.zeros((Kh, Kw_p, k * Cin, k * Cout), kernel.dtype)
    for q in range(-qL, qR + 1):
        for s_out in range(k):
            for s_in in range(k):
                dx = k * q + s_in - s_out
                if not (-p <= dx <= p):
                    continue
                ibase = 0
                for (ci, bi) in in_parts:
                    obase = 0
                    for (co, bo) in out_parts:
                        out = out.at[
                            :, q + qL,
                            ibase + s_in * ci: ibase + (s_in + 1) * ci,
                            obase + s_out * co: obase + (s_out + 1) * co,
                        ].set(kernel[:, dx + p, bi: bi + ci, bo: bo + co])
                        obase += k * co
                    ibase += k * ci
    return out, (qL, qR)


class SlotwiseConv1x1(nn.Module):
    """1x1 conv applied per packed slot: the packed (H, W/k, k*C) view is k
    contiguous slot groups [s*C, (s+1)*C), so a 1x1 conv that treats each
    slot independently is a grouped conv with the SAME (1, 1, Cin, Cout)
    parameter tiled across groups — identical params AND identical FLOPs to
    the unpacked nn.Conv (unlike PackedConv's k-fold dense kernels). The
    packed lowering of every pointwise conv (EfficientNet expand/project,
    encoder.py:7-104's MBConv internals) should use this."""
    features: int
    k: int = 2
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xp):
        k = self.k
        assert xp.shape[-1] % k == 0, (xp.shape, k)
        Cin = xp.shape[-1] // k
        kernel = self.param('kernel', self.kernel_init,
                            (1, 1, Cin, self.features), jnp.float32)
        dtype = self.dtype or xp.dtype
        pk = jnp.concatenate([kernel.astype(dtype)] * k, axis=-1)
        y = lax.conv_general_dilated(
            xp.astype(dtype), pk, window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'), feature_group_count=k)
        if self.use_bias:
            bias = self.param('bias', self.bias_init, (self.features,),
                              jnp.float32).astype(dtype)
            y = y + jnp.tile(bias, k)
        return y


def pack_kernel_strided(kernel, k_in, k_out, stride, pad):
    """Generalised packed-kernel rearrangement: strided and mixed-pack convs.

    Lowers an original (Kh, Kw, Cin, Cout) conv with column stride ``stride``
    and symmetric column padding ``pad`` into a conv that reads a k_in-packed
    (H, W/k_in, k_in*Cin) view and writes a k_out-packed view, entirely as a
    trace-time kernel rearrangement (block-sparse, zero blocks elsewhere).

    Derivation: output packed column x' slot s (s < k_out) is original output
    column k_out*x' + s, whose tap dx reads original input column
    stride*(k_out*x' + s) + dx = packed column stride_p*x' + q, slot r, with

        stride_p = stride * k_out / k_in   (must be an integer)
        dx       = k_in * q + r - stride * s

    Returns (packed_kernel, stride_p, (qL, qR)) where (qL, qR) is the packed
    column padding. qL*k_in may exceed the original left pad; the extra
    original columns are only read by zero blocks, so zero-padding is exact.
    """
    Kh, Kw, Cin, Cout = kernel.shape
    p = pad
    assert (stride * k_out) % k_in == 0, (stride, k_in, k_out)
    stride_p = stride * k_out // k_in
    # q = floor((stride*s + dx) / k_in) over s in [0, k_out), dx in [-p, p]
    qL = -((0 - p) // k_in) if p else 0          # -floor(-p/k_in)
    qR = (stride * (k_out - 1) + (Kw - 1 - p)) // k_in
    Kw_p = qL + qR + 1
    out = jnp.zeros((Kh, Kw_p, k_in * Cin, k_out * Cout), kernel.dtype)
    for s_out in range(k_out):
        for q in range(-qL, qR + 1):
            for r in range(k_in):
                dx = k_in * q + r - stride * s_out
                if not (-p <= dx <= Kw - 1 - p):
                    continue
                out = out.at[
                    :, q + qL,
                    r * Cin:(r + 1) * Cin,
                    s_out * Cout:(s_out + 1) * Cout,
                ].set(kernel[:, dx + p])
    return out, stride_p, (qL, qR)


def packed_bias_index(k, features, out_parts=None):
    """int32 (k*features,) map: packed output channel -> original channel."""
    out_parts = list(out_parts) if out_parts is not None else [(features, 0)]
    idx = np.zeros(k * features, np.int32)
    obase = 0
    for (co, bo) in out_parts:
        for s in range(k):
            idx[obase + s * co: obase + (s + 1) * co] = np.arange(bo, bo + co)
        obase += k * co
    return idx


class PackedConv(nn.Module):
    """Stride-1 conv evaluated on the packed (H, W/k, k*C) view.

    Declares the SAME 'kernel' (Kh, Kw, Cin, Cout) / 'bias' parameters as
    flax nn.Conv (name it 'Conv_0' etc. to keep checkpoint paths identical);
    the packed rearrangement happens at trace time.

    With ``stride`` / ``k_out`` set (strided or mixed-pack lowering, e.g. the
    decoder's stride-2 stages) the in/out_parts options are unsupported; the
    H stride equals ``stride`` and the packed W stride is derived
    (pack_kernel_strided).
    """
    features: int
    kernel_size: Tuple[int, int]
    k: int = 2
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Any] = None
    in_channels: Optional[int] = None        # original Cin (sum of in_parts)
    in_parts: Optional[Sequence[Tuple[int, int]]] = None
    out_parts: Optional[Sequence[Tuple[int, int]]] = None
    stride: int = 1
    k_out: Optional[int] = None              # output packing; default = k
    # Explicit ORIGINAL-coordinate padding ((ph_l, ph_r), (pw_l, pw_r)) for
    # the strided path — needed for TF-SAME convs whose padding is asymmetric
    # (e.g. the EfficientNet stem: 3x3 s2 on even dims pads (0, 1)). None
    # keeps the symmetric torch-style default.
    padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None

    @nn.compact
    def __call__(self, xp):
        k = self.k
        k_out = self.k_out if self.k_out is not None else k
        Cin = (self.in_channels if self.in_channels is not None
               else xp.shape[-1] // k)
        assert xp.shape[-1] == k * Cin, (xp.shape, k, Cin)
        Kh, Kw = self.kernel_size
        kernel = self.param('kernel', self.kernel_init,
                            (Kh, Kw, Cin, self.features), jnp.float32)
        dtype = self.dtype or xp.dtype
        ph = ((Kh - 1) // 2,) * 2 if self.padding is None else self.padding[0]
        k_mid = k_out
        if self.stride == 1 and k_out == k:
            assert self.padding is None, 'explicit padding: strided path only'
            pk, (qL, qR) = pack_kernel(kernel.astype(dtype), k,
                                       in_parts=self.in_parts,
                                       out_parts=self.out_parts)
            stride_p = 1
        else:
            assert self.in_parts is None and self.out_parts is None
            if (self.stride * k_out) % k:
                # stride_p = stride*k_out/k is fractional (e.g. k=4, stride=2,
                # k_out=1): lower at the smallest k_mid multiple of k_out with
                # an integral packed stride, then repack the output below.
                k_mid = k_out * (k // math.gcd(self.stride * k_out, k))
            pw = ((Kw - 1) // 2,) * 2 if self.padding is None else self.padding[1]
            pk, stride_p, (qL, qR) = pack_kernel_strided(
                kernel.astype(dtype), k, k_mid, self.stride, pw[0])
            if self.padding is not None:
                # asymmetric original padding: the kernel derivation fixes the
                # LEFT alignment (taps are placed relative to pw[0]); the
                # packed RIGHT pad is whatever yields the exact original
                # output width (trailing zero-pad reads are zero blocks or
                # true SAME zero-padding either way)
                W = xp.shape[-2] * k
                W_out = (W + pw[0] + pw[1] - Kw) // self.stride + 1
                assert W_out % k_mid == 0, (W_out, k_mid)
                qR = (W_out // k_mid - 1) * stride_p + (qL + qR + 1) \
                    - xp.shape[-2] - qL
        y = lax.conv_general_dilated(
            xp.astype(dtype), pk, window_strides=(self.stride, stride_p),
            padding=(ph, (qL, qR)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', self.bias_init, (self.features,),
                              jnp.float32).astype(dtype)
            y = y + bias[jnp.asarray(
                packed_bias_index(k_mid, self.features, self.out_parts))]
        if k_mid != k_out:
            y = unpack_w(y, k_mid)
            if k_out > 1:
                y = pack_w(y, k_out)
        return y
