"""Camera-to-BEV lifting (Lift-Splat) as static-shape XLA ops.

TPU-first redesign of the reference voxel pooling
(/root/reference/fiery/models/fiery.py:109-128, 193-273 and utils/geometry.py:283-314):
the reference masks, boolean-compacts and sorts a *data-dependent* point set per batch
element inside a python loop, with a custom cumsum-trick autograd Function. Here every
point keeps a fixed slot: out-of-bounds points are routed to a dump bin, and the splat
is a fully scatter-free sorted formulation (sort -> gather -> cumsum -> searchsorted
gather-diff) with a custom VJP whose backward is a single gather — see _sorted_splat.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _splat_accum_dtype():
    """Trace-time dtype choice for the segment-sum accumulation.

    FIERY_SPLAT_F32=1 casts splat rows to f32 for the scatter (and back after):
    an A/B knob for the observed asymmetry between the bf16 scatter rate
    (~31M rows/s) and the row-transaction floor (~55M rows/s)."""
    return jnp.float32 if os.environ.get('FIERY_SPLAT_F32', '0') == '1' else None


def create_frustum(final_dim, downsample, d_bound):
    """Fixed (D, h, w, 3) grid of (u, v, depth) image-plane points.

    Reference: models/fiery.py:109-128.
    """
    H, W = final_dim
    h, w = H // downsample, W // downsample
    depth_grid = np.arange(d_bound[0], d_bound[1], d_bound[2], dtype=np.float32)
    D = depth_grid.shape[0]
    x_grid = np.linspace(0, W - 1, w, dtype=np.float32)
    y_grid = np.linspace(0, H - 1, h, dtype=np.float32)
    frustum = np.stack(
        np.broadcast_arrays(
            x_grid[None, None, :], y_grid[None, :, None], depth_grid[:, None, None]
        ),
        axis=-1,
    )  # (D, h, w, 3) — (u, v, depth)
    return frustum


def get_geometry(frustum, intrinsics, extrinsics):
    """Unproject frustum points to the ego frame.

    frustum: (D, h, w, 3); intrinsics: (..., N, 3, 3); extrinsics: (..., N, 4, 4)
    Returns (..., N, D, h, w, 3) ego-frame xyz. Reference: models/fiery.py:193-208.
    """
    rotation = extrinsics[..., :3, :3]
    translation = extrinsics[..., :3, 3]
    # scale (u, v) by depth: homogeneous image coords -> camera rays
    points = jnp.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1
    )  # (D, h, w, 3)
    combined = rotation @ jnp.linalg.inv(intrinsics)  # (..., N, 3, 3)
    # (..., N, 1, 1, 1, 3, 3) @ (D, h, w, 3, 1)
    pts = jnp.einsum('...ij,dhwj->...dhwi', combined, points)
    return pts + translation[..., None, None, None, :]


def voxel_ids(geometry, bev_resolution, bev_start_position, bev_dimension):
    """Map ego-frame points to flat BEV bin ids; out-of-bounds -> dump bin.

    geometry: (..., 3). Returns int32 ids in [0, X*Y*Z], where X*Y*Z is the dump bin.
    Bin edges follow reference models/fiery.py:236-247.
    """
    res = jnp.asarray(bev_resolution, dtype=geometry.dtype)
    start = jnp.asarray(bev_start_position, dtype=geometry.dtype)
    dim = np.asarray(bev_dimension)
    # trunc (toward zero), not floor: the reference casts with .long()
    # (models/fiery.py:236-237), so fractional bins in (-1, 0) land in bin 0 and
    # survive the bounds mask.
    vox = jnp.trunc((geometry - (start - res / 2.0)) / res).astype(jnp.int32)
    valid = jnp.all((vox >= 0) & (vox < jnp.asarray(dim, dtype=jnp.int32)), axis=-1)
    X, Y, Z = int(dim[0]), int(dim[1]), int(dim[2])
    flat = (vox[..., 0] * Y + vox[..., 1]) * Z + vox[..., 2]
    dump = X * Y * Z
    return jnp.where(valid, flat, dump)


def splat_to_bev(features, ids, bev_dimension):
    """Scatter-add point features into the BEV grid.

    features: (P, C) flattened point features for one sample;
    ids: (P,) flat bin ids from ``voxel_ids``.
    Returns (X, Y, C) BEV features (Z summed out; reference keeps Z=1 and squeezes,
    models/fiery.py:263-269 — summing over Z generalises that without dynamic shapes).
    """
    dim = np.asarray(bev_dimension)
    X, Y, Z = int(dim[0]), int(dim[1]), int(dim[2])
    num_segments = X * Y * Z + 1
    out = jax.ops.segment_sum(features, ids, num_segments=num_segments)
    out = out[:-1].reshape(X, Y, Z, -1).sum(axis=2)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sorted_splat(features, ids, num_bins):
    """Splat for one sample: features (P, C), ids (P,) in [0, num_bins]
    (num_bins = dump). Returns (num_bins, C).

    Forward uses jax.ops.segment_sum — on this TPU, XLA lowers it to a sort of the
    ids + a segmented while-reduce + one scatter of the ~unique results, which beat
    an explicit sort/gather/cumsum/searchsorted pipeline by ~2x when measured (the
    big feature gather dominates the explicit version). The custom VJP keeps the
    backward a single clean gather: d_feat[p] = d_dense[ids[p]] (zero for dump-bin
    points).
    """
    return jax.ops.segment_sum(features, ids, num_segments=num_bins + 1)[:-1]


def _sorted_splat_fwd(features, ids, num_bins):
    return _sorted_splat(features, ids, num_bins), ids


def _sorted_splat_bwd(num_bins, ids, g):
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    d_feat = jnp.take(g_pad, jnp.minimum(ids, num_bins), axis=0)
    return (d_feat, None)


_sorted_splat.defvjp(_sorted_splat_fwd, _sorted_splat_bwd)


def lift_splat(features, geometry, bev_resolution, bev_start_position, bev_dimension,
               depth_keep=None):
    """Full splat: (B, N, h, w, D, C) point features + (B, N, D, h, w, 3) geometry -> (B, X, Y, C).

    features keep the encoder's natural (h, w, D, C) memory order: segment_sum does not
    care about point order, so instead of transposing the ~half-GB lifted feature volume
    to the reference's (D, h, w) convention (a materialised planar transpose on TPU), the
    tiny int32 id tensor from geometry is reordered to match the feature layout.

    depth_keep: optional static per-camera keep counts (N,) from
    ``compute_depth_plane_keep``: only the first ``depth_keep[n]`` depth planes of
    camera n enter the splat (the culled far planes are provably out-of-bounds for
    every pose in the calibration envelope, so they would all land in the dump
    bin). Row count — not bytes — is the splat wall on TPU (~50-60M rows/s), so
    static plane culling is a direct speedup on small BEV grids (fishing/pon
    settings cull 72%/13% of rows; the 100x100 baseline culls ~0 — measured).
    """
    C = features.shape[-1]
    dim = np.asarray(bev_dimension)
    X, Y, Z = int(dim[0]), int(dim[1]), int(dim[2])
    ids = voxel_ids(geometry, bev_resolution, bev_start_position, bev_dimension)
    ids = jnp.moveaxis(ids, 2, 4)  # (B, N, D, h, w) -> (B, N, h, w, D)

    accum = _splat_accum_dtype()

    if depth_keep is None:
        def per_sample(feat_b, ids_b):
            f = feat_b.reshape(-1, C)
            if accum is not None and f.dtype != accum:
                dense = _sorted_splat(f.astype(accum), ids_b.reshape(-1),
                                      X * Y * Z).astype(f.dtype)
            else:
                dense = _sorted_splat(f, ids_b.reshape(-1), X * Y * Z)
            return dense.reshape(X, Y, Z, C).sum(axis=2)

        return jax.vmap(per_sample)(features, ids)

    depth_keep = tuple(int(k) for k in depth_keep)
    assert len(depth_keep) == features.shape[1], (depth_keep, features.shape)

    def per_sample(feat_b, ids_b):
        # one segment-sum per camera over its kept depth planes (static slices —
        # no row gather), summed into the dense grid
        dense = None
        for n, k in enumerate(depth_keep):
            f = feat_b[n, :, :, :k, :].reshape(-1, C)
            i = ids_b[n, :, :, :k].reshape(-1)
            d = _sorted_splat(f, i, X * Y * Z)
            dense = d if dense is None else dense + d
        return dense.reshape(X, Y, Z, C).sum(axis=2)

    return jax.vmap(per_sample)(features, ids)


def _order_bits(x):
    """Map floats to order-preserving unsigned ints in their NATIVE width:
    bf16 -> u16 (a 4-level radix descent instead of 8 — bf16 has only 16
    significant bits, so descending an f32 upcast wastes half the passes),
    everything else -> u32 via f32. Comparison caveat: -0.0 and +0.0 map to
    distinct ints (same as losses._kth_largest) — irrelevant for softmax
    depth, which is strictly positive."""
    if x.dtype == jnp.bfloat16:
        b = jax.lax.bitcast_convert_type(x, jnp.uint16)
        return jnp.where((b >> 15) == 0, b | jnp.uint16(0x8000), ~b), 16
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where((b >> 31) == 0, b | jnp.uint32(0x80000000), ~b), 32


def _kth_largest_bits(u, k, nbits):
    """Exact k-th largest of order-mapped uint values along the last axis:
    4-bit dense-histogram descent (compare + reduce only — no sort, no
    scatter), nbits/4 levels. Generic-width twin of losses._kth_largest."""
    prefix = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
    rank = jnp.full(u.shape[:-1] + (1,), k, jnp.int32)
    buckets = jnp.arange(16, dtype=jnp.int32)
    for level in range(nbits // 4):
        shift = nbits - 4 - 4 * level
        active = ((u >> (shift + 4)) == (prefix >> (shift + 4))
                  if level else jnp.ones(u.shape, bool))
        b = ((u >> shift) & jnp.asarray(0xF, u.dtype)).astype(jnp.int32)
        onehot = (b[..., None] == buckets) & active[..., None]
        hist = onehot.sum(axis=-2)                           # (..., 16)
        cnt_ge = jnp.cumsum(hist[..., ::-1], axis=-1)[..., ::-1]
        bstar = jnp.sum((cnt_ge >= rank).astype(jnp.int32), axis=-1,
                        keepdims=True) - 1                   # largest bucket >= rank
        # 16-lane one-hot select instead of take_along_axis: the per-pixel
        # row gather runs at the transaction floor; this is pure bandwidth
        cnt_gt = jnp.sum(jnp.where(buckets == bstar, cnt_ge - hist, 0),
                         axis=-1, keepdims=True)
        rank = rank - cnt_gt
        prefix = prefix | (bstar.astype(u.dtype) << jnp.asarray(shift, u.dtype))
    return prefix


def _topk_select_nosort(depth, ids, k):
    """Exact top-k SET selection without any sort (FIERY_TOPK_SELECT=nosort,
    the default).

    The serving trace at k=8 shows lax.top_k lowering to a full 48-wide
    payload sort that costs as much as the splat accumulate itself
    (CLAUDE.md). This variant radix-selects the exact k-th largest depth per
    pixel (the losses.py histogram descent — compare+reduce only), then
    compacts the selected bins into k slots by index rank: selection SET is
    identical to lax.top_k (ties at the k-th value take the lowest depth
    indices, like top_k's stable tie rule); slot ORDER is ascending bin index
    instead of descending value — irrelevant downstream, because the splat is
    an unordered segment sum (output differs only by f32 reduction order).

    Returns (top_w, ids_k), each (..., k).
    """
    u, nbits = _order_bits(depth)
    kth_u = _kth_largest_bits(u, k, nbits)                   # (..., 1) exact
    gt = u > kth_u
    eq = u == kth_u
    n_gt = gt.sum(axis=-1, keepdims=True)
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1)      # 1-based among ties
    sel = gt | (eq & (eq_rank <= (k - n_gt)))                # exactly k true
    slot = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1    # 0..k-1 where sel
    onehot = sel[..., None] & (slot[..., None] == jnp.arange(k))  # (..., D, k)
    top_w = jnp.sum(jnp.where(onehot, depth[..., None], 0), axis=-2)
    ids_k = jnp.sum(jnp.where(onehot, ids[..., None], 0), axis=-2)
    return top_w, ids_k


def lift_splat_topk(depth, features, geometry, k,
                    bev_resolution, bev_start_position, bev_dimension):
    """Sparse depth splat: only the top-k depth bins of each pixel enter the
    scatter (static shapes — k is a trace-time constant).

    depth: (B, N, h, w, D) softmax depth distribution;
    features: (B, N, h, w, C) per-pixel context features (pre outer-product);
    geometry: (B, N, D, h, w, 3) ego-frame points. Returns (B, X, Y, C).

    Rationale: on TPU the splat cost is ROW COUNT / ~55M rows/s (the scatter's
    sort+gather transaction floor — see CLAUDE.md), and the dense lift
    (reference models/fiery.py:221-273 splats every one of the D=48 bins per
    pixel) spends most rows on near-zero softmax mass. Keeping the k largest
    bins cuts rows D/k-fold. NOT bit-equal to the dense splat (k == D is —
    covered by tests); an approximation knob (cfg LIFT.TOPK) for
    throughput-critical training/serving, default off on the parity path.

    The gradient is the exact gradient of this sparse forward: top_k is
    piecewise-constant in the selection, so d(depth) flows to the selected
    bins and d(features) through the selected outer products only.
    """
    C = features.shape[-1]
    dim = np.asarray(bev_dimension)
    X, Y, Z = int(dim[0]), int(dim[1]), int(dim[2])
    ids = voxel_ids(geometry, bev_resolution, bev_start_position, bev_dimension)
    ids = jnp.moveaxis(ids, 2, 4)                       # (B, N, h, w, D)
    # Selection variant (FIERY_TOPK_SELECT env, trace-time): all three pick the
    # identical top-k SET (same tie rule); they differ only in lowering cost and
    # slot order (order is irrelevant — the splat is an unordered segment sum).
    #   'nosort' (default): radix-select + rank compaction, no sort — measured
    #             fastest (eval topk=8: 27.67 vs 27.08 clips/s vs 'topk');
    #   'topk':   lax.top_k + id gather (lowers to a full 48-wide sort);
    #   'sort':   one variadic sort carrying ids (measured 9% worse than 'topk').
    variant = os.environ.get('FIERY_TOPK_SELECT', 'nosort')
    if variant == 'sort':
        neg_d, ids_sorted = lax.sort((-depth, ids), dimension=-1, num_keys=1)
        top_w = -neg_d[..., :k]                         # (B, N, h, w, k)
        ids_k = ids_sorted[..., :k]
    elif variant == 'topk':
        top_w, top_i = lax.top_k(depth, k)              # (B, N, h, w, k)
        ids_k = jnp.take_along_axis(ids, top_i, axis=-1)
    elif variant == 'nosort':
        top_w, ids_k = _topk_select_nosort(depth, ids, k)
    else:
        raise ValueError(f'FIERY_TOPK_SELECT must be nosort|topk|sort, '
                         f'got {variant!r}')
    vol = top_w[..., None] * features[..., None, :]     # (B, N, h, w, k, C)

    accum = _splat_accum_dtype()

    def per_sample(vol_b, ids_b):
        f = vol_b.reshape(-1, C)
        if accum is not None and f.dtype != accum:
            dense = _sorted_splat(f.astype(accum), ids_b.reshape(-1),
                                  X * Y * Z).astype(f.dtype)
        else:
            dense = _sorted_splat(f, ids_b.reshape(-1), X * Y * Z)
        return dense.reshape(X, Y, Z, C).sum(axis=2)

    return jax.vmap(per_sample)(vol, ids_k)


def compute_depth_plane_keep(frustum, intrinsics, extrinsics,
                             bev_resolution, bev_start_position, bev_dimension,
                             t_margin=0.5, rot_margin_deg=2.0):
    """Per-camera KEEP count of leading depth planes (static far-plane culling).

    Host-side (numpy) analysis over OBSERVED calibrations: a depth plane of
    camera n is cullable when, for every observed pose, every point of the plane
    lies outside the XY BEV box inflated by a soundness slack
    ``t_margin + d_cam * sin(rot_margin)`` (d_cam = distance from the camera
    origin — the bound on how far a point can move under any pose within the
    margin envelope of an observed pose). Only a contiguous far range is culled.
    The reference masks these points dynamically per step
    (/root/reference/fiery/models/fiery.py:240-247); here they are removed from
    the graph statically.

    frustum: (D, h, w, 3); intrinsics/extrinsics: (..., N, 3, 3)/(..., N, 4, 4)
    over any number of observed frames. Returns np.int32 (N,) keep counts.
    """
    frustum = np.asarray(frustum)
    intr = np.asarray(intrinsics, np.float64).reshape(-1, *intrinsics.shape[-3:])
    extr = np.asarray(extrinsics, np.float64).reshape(-1, *extrinsics.shape[-3:])
    n_obs, N = intr.shape[0], intr.shape[1]
    D = frustum.shape[0]
    res = np.asarray(bev_resolution, np.float64)
    start = np.asarray(bev_start_position, np.float64)
    dim = np.asarray(bev_dimension)
    # XY box covered by bins [0, dim): trunc-cast semantics of voxel_ids mean
    # coords in [start - res/2 - res, start - res/2 + dim*res) can land in-bounds
    # (trunc sends (-1, 0) fractional bins to 0); widen by one res to be safe.
    lo = start[:2] - res[:2] / 2.0 - res[:2]
    hi = start[:2] - res[:2] / 2.0 + dim[:2] * res[:2] + res[:2]

    points = np.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1)
    rot_sin = np.sin(np.radians(rot_margin_deg))

    keep = np.zeros((N,), np.int32)
    for n in range(N):
        needed = np.zeros((D,), bool)
        for o in range(n_obs):
            R = extr[o, n, :3, :3]
            t = extr[o, n, :3, 3]
            combined = R @ np.linalg.inv(intr[o, n])
            pts = np.einsum('ij,dhwj->dhwi', combined, points) + t  # (D,h,w,3)
            d_cam = np.linalg.norm(pts - t, axis=-1)
            slack = t_margin + d_cam * rot_sin
            inside = ((pts[..., 0] > lo[0] - slack) & (pts[..., 0] < hi[0] + slack)
                      & (pts[..., 1] > lo[1] - slack) & (pts[..., 1] < hi[1] + slack))
            needed |= inside.any(axis=(1, 2))
        # contiguous far cull: keep through the last needed plane
        keep[n] = int(np.max(np.nonzero(needed)[0])) + 1 if needed.any() else 1
    return keep


def depth_feature_outer_product(x, D, C):
    """Split encoder head output into depth logits and features; return lifted volume.

    x: (B, h, w, D + C) head output. Returns (B, h, w, D, C) = softmax_D(depth) outer feat
    in the head's natural memory order (channels-last, D next-to-last); lift_splat
    reorders bin ids — never this volume — to align points. Reference semantics:
    models/encoder.py:98-100 (which materialises the (B, C, D, h, w) permute instead).
    """
    depth = jax.nn.softmax(x[..., :D], axis=-1)          # (B, h, w, D)
    feat = x[..., D:D + C]                               # (B, h, w, C)
    return depth[..., None] * feat[..., None, :]         # (B, h, w, D, C)
