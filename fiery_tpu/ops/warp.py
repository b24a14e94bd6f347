"""BEV feature warping: torch-parity grid sampling + SE(2) ego-motion warps.

Re-implements the reference warp stack (/root/reference/fiery/utils/geometry.py:181-280)
as pure-jnp gathers in NHWC layout. Parity traps handled here:
  * ``align_corners=False`` normalised-coordinate convention in both the affine grid
    construction and the sampler (off-by-half errors silently destroy VPQ),
  * zero padding outside the image,
  * the forward-axis sign flip and (tx, ty) swap of the reference warp
    (geometry.py:200-203, 213-214).

Everything here is jit-friendly: static shapes, no data-dependent control flow.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

from fiery_tpu.utils.geometry import (
    invert_pose_matrix,
    mat2pose_vec,
    pose_vec2mat,
)


def _patch_warp_enabled():
    """Bilinear sampling via ONE 2x2-patch gather per point instead of four
    separate corner gathers (exact same math; covered by the torch parity
    tests). MEASURED DEAD END on TPU — default OFF: the hypothesis was that the
    transaction-bound tap gathers (~34M rows/s, four ~7 ms fusions per warp)
    would collapse into one transaction per point, but slice_sizes=(2,2,C)
    windows lower to something far worse — the full train step measured
    1450 ms vs 488 ms (3x slower). XLA's row gather is only fast for
    single-row slices. FIERY_PATCH_WARP=1 re-enables for future re-measurement
    on other hardware/compiler versions."""
    return os.environ.get('FIERY_PATCH_WARP', '0') == '1'


def _pair_warp_enabled():
    """Bilinear sampling via TWO (1, 2, C)-window gathers per point instead of
    four corner gathers (exact same math). Unlike the refuted (2, 2, C) patch
    gather (3x regression — multi-H-row windows lower terribly), a (1, 2, C)
    window stays inside ONE H row: the two x-taps are contiguous in memory, so
    the hypothesis was the window rides the fast single-row gather path while
    halving the random row transactions. MEASURED DEAD END on TPU — default
    OFF: the full train step measured 2544 ms vs 488 ms (5x slower, worse than
    even the (2,2,C) patch's 1450 ms). ANY windowed gather — contiguous or not
    — falls off the fast path on this toolchain; only slice_sizes=(1,1,C)
    point gathers are fast. A/B via FIERY_PAIR_WARP=1 for other hardware."""
    return os.environ.get('FIERY_PAIR_WARP', '0') == '1'


def grid_sample_2d(image, grid, mode='bilinear'):
    """Sample ``image`` (..., H, W, C) at normalised ``grid`` (..., Ho, Wo, 2) coordinates.

    grid[..., 0] indexes the W axis, grid[..., 1] the H axis, both in [-1, 1] with the
    torch ``align_corners=False`` convention and zero padding outside the input.
    Leading batch dims of image/grid must match.
    """
    if image.ndim == 3:
        return _grid_sample_single(image, grid, mode)
    # vmap over all leading batch dims
    batch_shape = image.shape[:-3]
    img_flat = image.reshape((-1,) + image.shape[-3:])
    grid_flat = grid.reshape((-1,) + grid.shape[-3:])
    out = jax.vmap(lambda im, g: _grid_sample_single(im, g, mode))(img_flat, grid_flat)
    return out.reshape(batch_shape + out.shape[1:])


def _grid_sample_single(image, grid, mode):
    H, W, C = image.shape
    gx, gy = grid[..., 0], grid[..., 1]
    # Unnormalise (align_corners=False): gx=-1 -> -0.5, gx=+1 -> W-0.5
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = image[yi_c, xi_c]  # (..., C)
        return vals * valid[..., None].astype(image.dtype)

    if mode == 'nearest':
        # torch uses std::nearbyint (round-half-to-even), matching jnp.round
        xi = jnp.round(ix).astype(jnp.int32)
        yi = jnp.round(iy).astype(jnp.int32)
        return gather(yi, xi)
    elif mode == 'bilinear':
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        x1, y1 = x0 + 1, y0 + 1
        wx1 = (ix - x0.astype(ix.dtype)).astype(image.dtype)
        wy1 = (iy - y0.astype(iy.dtype)).astype(image.dtype)
        wx0, wy0 = 1.0 - wx1, 1.0 - wy1

        if _patch_warp_enabled():
            return _bilinear_patch(image, x0, y0, wx0, wx1, wy0, wy1)
        if _pair_warp_enabled():
            return _bilinear_pair(image, x0, y0, wx0, wx1, wy0, wy1)

        out = (
            gather(y0, x0) * (wy0 * wx0)[..., None]
            + gather(y0, x1) * (wy0 * wx1)[..., None]
            + gather(y1, x0) * (wy1 * wx0)[..., None]
            + gather(y1, x1) * (wy1 * wx1)[..., None]
        )
        return out
    else:
        raise ValueError(f'Unsupported sampling mode: {mode}')


def _bilinear_patch(image, x0, y0, wx0, wx1, wy0, wy1):
    """Bilinear sample via one 2x2-patch gather per point (exact 4-tap math).

    The image is zero-padded by 1 px so a window starting at (y0, x0) clamped
    into the padded extent always covers the right taps: any tap that is
    outside the ORIGINAL image is either a padded zero (1 px out) or has its
    weight zeroed by the per-tap validity mask (further out, where the clamp
    would misalign the patch)."""
    H, W, C = image.shape
    out_shape = x0.shape
    padded = jnp.pad(image, ((1, 1), (1, 1), (0, 0)))
    sy = jnp.clip(y0.reshape(-1) + 1, 0, H)
    sx = jnp.clip(x0.reshape(-1) + 1, 0, W)
    starts = jnp.stack([sy, sx], axis=-1)                      # (P, 2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = lax.gather(padded, starts, dnums, slice_sizes=(2, 2, C))  # (P,2,2,C)

    def tap_valid(yi, xi):
        return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).reshape(-1)

    w = [(wy0 * wx0, tap_valid(y0, x0), 0, 0),
         (wy0 * wx1, tap_valid(y0, x0 + 1), 0, 1),
         (wy1 * wx0, tap_valid(y0 + 1, x0), 1, 0),
         (wy1 * wx1, tap_valid(y0 + 1, x0 + 1), 1, 1)]
    out = jnp.zeros((patches.shape[0], C), image.dtype)
    for weight, valid, dy, dx in w:
        coeff = weight.reshape(-1) * valid.astype(image.dtype)
        out = out + patches[:, dy, dx, :] * coeff[:, None]
    return out.reshape(out_shape + (C,))


def _bilinear_pair(image, x0, y0, wx0, wx1, wy0, wy1):
    """Bilinear sample via two (1, 2, C) row-pair gathers (exact 4-tap math).

    The image is zero-padded by 1 px in W only, so a window starting at
    (y, x0) clamped into the padded W extent always covers both x-taps: a tap
    outside the ORIGINAL image is either a padded zero (1 px out in W) or has
    its weight zeroed by the per-tap validity mask (further out in W, or any
    y outside [0, H) — y is clamped, so the whole row's weight is masked)."""
    H, W, C = image.shape
    out_shape = x0.shape
    padded = jnp.pad(image, ((0, 0), (1, 1), (0, 0)))           # (H, W+2, C)
    sx = jnp.clip(x0.reshape(-1) + 1, 0, W)                     # window 2 fits

    def x_valid(xi):
        return ((xi >= 0) & (xi < W)).reshape(-1)

    vx0, vx1 = x_valid(x0), x_valid(x0 + 1)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1))
    out = jnp.zeros((sx.shape[0], C), image.dtype)
    for yi, wy in ((y0, wy0), (y0 + 1, wy1)):
        vy = ((yi >= 0) & (yi < H)).reshape(-1)
        yc = jnp.clip(yi.reshape(-1), 0, H - 1)
        starts = jnp.stack([yc, sx], axis=-1)                   # (P, 2)
        pair = lax.gather(padded, starts, dnums, slice_sizes=(1, 2, C))  # (P,2,C)
        wyf = wy.reshape(-1) * vy.astype(image.dtype)
        out = out + pair[:, 0, :] * (wyf * wx0.reshape(-1) * vx0.astype(image.dtype))[:, None]
        out = out + pair[:, 1, :] * (wyf * wx1.reshape(-1) * vx1.astype(image.dtype))[:, None]
    return out.reshape(out_shape + (C,))


def _affine_grid(theta, H, W):
    """torch.nn.functional.affine_grid parity, align_corners=False.

    theta: (..., 2, 3). Returns (..., H, W, 2) normalised sampling coordinates.
    """
    xs = (2.0 * jnp.arange(W, dtype=theta.dtype) + 1.0) / W - 1.0   # width axis
    ys = (2.0 * jnp.arange(H, dtype=theta.dtype) + 1.0) / H - 1.0   # height axis
    base_x = jnp.broadcast_to(xs[None, :], (H, W))
    base_y = jnp.broadcast_to(ys[:, None], (H, W))
    ones = jnp.ones((H, W), dtype=theta.dtype)
    base = jnp.stack([base_x, base_y, ones], axis=-1)               # (H, W, 3)
    # grid[..., i, j, k] = sum_m theta[..., k, m] * base[i, j, m]
    return jnp.einsum('...km,ijm->...ijk', theta, base)


def _warp_theta(flow, spatial_extent, dtype):
    """The SE(2) affine of ``warp_features`` in normalised grid coordinates.

    flow: (b, 6) pose vectors. Returns (b, 2, 3) theta with the reference's sign
    conventions (geometry.py:199-214): rows [cos, -sin, ty], [sin, cos, tx] with
    tx = -flow_x / extent_x (forward axis inverted), ty = flow_y / extent_y.
    """
    b = flow.shape[0]
    angle = flow[:, 5]
    tx = -flow[:, 0] / spatial_extent[0]
    ty = flow[:, 1] / spatial_extent[1]
    cos_t, sin_t = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [cos_t, -sin_t, ty, sin_t, cos_t, tx], axis=-1
    ).reshape(b, 2, 3).astype(dtype)


def warp_features(x, flow, mode='nearest', spatial_extent=None):
    """SE(2) warp of BEV maps. x: (b, H, W, C) NHWC, flow: (b, 6) 6-DoF pose vector.

    Uses only the z-rotation (flow[:, 5]) and xy translation (flow[:, :2]) with the
    reference's sign conventions (geometry.py:181-222). H is the forward (X) axis,
    W the sides (Y) axis of the BEV grid.
    """
    if flow is None:
        return x
    b, H, W, _ = x.shape
    theta = _warp_theta(flow, spatial_extent, x.dtype)
    grid = _affine_grid(theta, H, W)
    return grid_sample_2d(x, grid, mode=mode)


def compose_poses_to_present(flow):
    """Compose incremental poses to per-past-frame present-relative pose vectors.

    flow: (b, t, 6) pose from frame i to i+1. Returns (b, t-1, 6): entry i is
    flow[i] @ ... @ flow[t-2] — exactly the pose ``cumulative_warp_features``
    warps frame i by (the present frame t-1 needs none).
    """
    b, seq_len = flow.shape[:2]
    flow_mat = pose_vec2mat(flow)
    mats = [flow_mat[:, -2]]
    for t in reversed(range(seq_len - 2)):
        mats.append(flow_mat[:, t] @ mats[-1])
    return mat2pose_vec(jnp.stack(mats[::-1], axis=1))


def warp_points_to_present(points_xy, flow, spatial_extent, bev_bounds):
    """Map frame-t metric BEV points to the present frame — the exact inverse of
    ``warp_features``' sampling affine, in point space.

    A feature splatted at frame-t position q and then bilinearly warped by
    ``warp_features(·, flow)`` appears at present positions p with q = A(p)
    (A = the theta affine in normalised coordinates); transforming the splat
    points by A^{-1} instead makes the splat land directly in the present grid —
    no feature warp, no bilinear blur, one fewer HBM pass over the BEV volume
    (the warp-free lift, cfg LIFT.WARP_FREE).

    points_xy: (..., 2) metric (X, Y) with leading batch axis matching flow;
    flow: (b, 6); bev_bounds: ((x_lo, x_hi), (y_lo, y_hi)) static floats.
    Normalised coords relate to metric via X = c_x + h_x * by (pixel centres of
    ``_affine_grid`` hit bin centres exactly: X(i) = x_lo + res/2 + i*res), so
    A^{-1} in metric space is a rotation with aspect a = h_x / h_y plus the
    extent-scaled translation — see the derivation in tests/test_warp.py.
    """
    (x_lo, x_hi), (y_lo, y_hi) = bev_bounds
    c_x, h_x = (x_lo + x_hi) / 2.0, (x_hi - x_lo) / 2.0
    c_y, h_y = (y_lo + y_hi) / 2.0, (y_hi - y_lo) / 2.0
    a = h_x / h_y
    dt = points_xy.dtype
    angle = flow[:, 5].astype(dt)
    # the theta translation in metric units of the OUTPUT grid axes
    fx = (flow[:, 0] * (h_x / spatial_extent[0])).astype(dt)
    fy = (flow[:, 1] * (h_y / spatial_extent[1])).astype(dt)
    cos_t, sin_t = jnp.cos(angle), jnp.sin(angle)
    shape = (-1,) + (1,) * (points_xy.ndim - 2)
    cos_t, sin_t = cos_t.reshape(shape), sin_t.reshape(shape)
    p = points_xy[..., 0] - c_x + fx.reshape(shape)
    q = points_xy[..., 1] - c_y - fy.reshape(shape)
    x_p = c_x + cos_t * p - (a * sin_t) * q
    y_p = c_y + (sin_t / a) * p + cos_t * q
    return jnp.stack([x_p, y_p], axis=-1)


def cumulative_warp_features(x, flow, mode='nearest', spatial_extent=None):
    """Warp past BEV frames to the present frame by composing incremental poses.

    x: (b, t, H, W, C); flow: (b, t, 6) pose from frame t to t+1.
    x[:, -1] unchanged; x[:, t] warped by flow[t] @ ... @ flow[-2].
    Reference: geometry.py:225-253.
    """
    b, seq_len = x.shape[:2]
    if seq_len == 1:
        return x
    # compose the (tiny) cumulative pose matrices, then warp every past frame in a
    # single batched gather instead of one dispatch per frame
    poses = compose_poses_to_present(flow)                     # (b, seq_len-1, 6)
    warped = warp_features(
        x[:, :-1].reshape(b * (seq_len - 1), *x.shape[2:]),
        poses.reshape(b * (seq_len - 1), 6),
        mode=mode, spatial_extent=spatial_extent,
    ).reshape(b, seq_len - 1, *x.shape[2:])
    return jnp.concatenate([warped, x[:, -1:]], axis=1)


def cumulative_warp_features_reverse(x, flow, mode='nearest', spatial_extent=None):
    """Warp future BEV frames back to the present frame (label preparation).

    x: (b, t, H, W, C); flow: (b, t, 6). x[:, 0] unchanged; x[:, i] warped by
    inv(flow[0]) @ ... @ inv(flow[i-1]). Reference: geometry.py:256-280.
    """
    b, seq_len = x.shape[:2]
    if seq_len == 1:
        return x
    flow_mat = pose_vec2mat(flow)

    # frame i is warped by inv(flow[0]) @ ... @ inv(flow[i-1]); compose the matrices
    # first, then warp all future frames in one batched gather
    inv = invert_pose_matrix(flow_mat)
    mats = [inv[:, 0]]
    for i in range(2, seq_len):
        mats.append(mats[-1] @ inv[:, i - 1])
    poses = mat2pose_vec(jnp.stack(mats, axis=1))              # (b, seq_len-1, 6)
    warped = warp_features(
        x[:, 1:].reshape(b * (seq_len - 1), *x.shape[2:]),
        poses.reshape(b * (seq_len - 1), 6),
        mode=mode, spatial_extent=spatial_extent,
    ).reshape(b, seq_len - 1, *x.shape[2:])
    return jnp.concatenate([x[:, :1], warped], axis=1)
