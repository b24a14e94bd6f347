"""Voxel pooling (lift-splat) tests: dense scatter oracle + reference parity semantics.

The oracle mirrors the reference masking/sort/cumsum pipeline
(models/fiery.py:221-273, utils/geometry.py:283-314) with plain numpy.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from fiery_tpu.ops import lift_splat as LS
from fiery_tpu.utils.geometry import calculate_birds_eye_view_parameters

pytestmark = pytest.mark.fast

X_BOUND = [-50.0, 50.0, 0.5]
Y_BOUND = [-50.0, 50.0, 0.5]
Z_BOUND = [-10.0, 10.0, 20.0]


def oracle_splat(features, geometry, res, start, dim):
    """Numpy dense scatter-add oracle for one sample."""
    X, Y, Z = int(dim[0]), int(dim[1]), int(dim[2])
    C = features.shape[-1]
    out = np.zeros((X, Y, C), dtype=np.float64)
    pts = features.reshape(-1, C)
    geo = geometry.reshape(-1, 3)
    # .astype truncates toward zero, matching the reference's .long() cast
    # (models/fiery.py:236-237)
    vox = ((geo - (start - res / 2.0)) / res).astype(np.int64)
    valid = ((vox >= 0) & (vox < np.asarray([X, Y, Z]))).all(axis=-1)
    for p in range(pts.shape[0]):
        if valid[p]:
            out[vox[p, 0], vox[p, 1]] += pts[p]
    return out


def test_frustum_values():
    frustum = LS.create_frustum((224, 480), 8, [2.0, 50.0, 1.0])
    assert frustum.shape == (48, 28, 60, 3)
    # depth bins 2..49
    np.testing.assert_allclose(frustum[:, 0, 0, 2], np.arange(2.0, 50.0))
    # u spans [0, W-1], v spans [0, H-1]
    np.testing.assert_allclose(frustum[0, 0, :, 0], np.linspace(0, 479, 60))
    np.testing.assert_allclose(frustum[0, :, 0, 1], np.linspace(0, 223, 28))


def test_get_geometry_identity_cam():
    """With identity rotation/intrinsics, points = (u*d, v*d, d) + translation."""
    frustum = LS.create_frustum((16, 16), 8, [1.0, 3.0, 1.0])
    intrinsics = jnp.eye(3)[None, None]
    extrinsics = jnp.eye(4)[None, None]
    extrinsics = extrinsics.at[0, 0, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    geo = np.asarray(LS.get_geometry(jnp.asarray(frustum), intrinsics, extrinsics))[0, 0]
    expected = np.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1
    ) + np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(geo, expected, atol=1e-5)


def test_get_geometry_pinhole():
    """A point at pixel (cx, cy) must unproject onto the camera axis."""
    frustum = np.array([[[[100.0, 50.0, 10.0]]]], dtype=np.float32)  # u=cx, v=cy, d=10
    K = jnp.array([[50.0, 0, 100.0], [0, 50.0, 50.0], [0, 0, 1]])[None, None]
    E = jnp.eye(4)[None, None]
    geo = np.asarray(LS.get_geometry(jnp.asarray(frustum), K, E))[0, 0, 0, 0, 0]
    np.testing.assert_allclose(geo, [0.0, 0.0, 10.0], atol=1e-4)


def test_voxel_pooling_matches_oracle():
    rng = np.random.RandomState(0)
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    B, N, D, h, w, C = 2, 3, 4, 5, 6, 7
    features = rng.randn(B, N, h, w, D, C).astype(np.float32)
    # geometry mostly inside bounds, some outside
    geometry = rng.uniform(-60, 60, (B, N, D, h, w, 3)).astype(np.float32)
    geometry[..., 2] = rng.uniform(-9, 9, (B, N, D, h, w))

    out = np.asarray(LS.lift_splat(jnp.asarray(features), jnp.asarray(geometry),
                                   res, start, dim))
    assert out.shape == (B, 200, 200, C)
    for b in range(B):
        # align the oracle's point order with the feature layout (h, w, D)
        geo_b = np.moveaxis(geometry[b], 1, 3)  # (N, D, h, w, 3) -> (N, h, w, D, 3)
        expected = oracle_splat(features[b], geo_b, res, start, dim)
        np.testing.assert_allclose(out[b], expected, atol=1e-3)


def test_voxel_pooling_gradient_is_gather():
    """d(sum of one bin)/d(features) must be 1 exactly for points in that bin, 0 elsewhere."""
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    # two points in the same voxel, one in another, one out of bounds
    geometry = jnp.asarray(np.array(
        [[[0.1, 0.1, 0.0], [0.2, 0.2, 0.0], [10.0, 10.0, 0.0], [500.0, 0.0, 0.0]]],
        dtype=np.float32))[None]  # (1, 1, 4, 3) -> reshape below
    geometry = geometry.reshape(1, 1, 4, 1, 1, 3)   # (B, N, D, h, w, 3)
    features = jnp.ones((1, 1, 1, 1, 4, 1), dtype=jnp.float32)  # (B, N, h, w, D, C)

    def f(feat):
        out = LS.lift_splat(feat, geometry, res, start, dim)
        return out.sum()

    grads = np.asarray(jax.grad(f)(features)).reshape(-1)
    np.testing.assert_allclose(grads, [1.0, 1.0, 1.0, 0.0])


def test_depth_feature_outer_product():
    rng = np.random.RandomState(1)
    D, C = 4, 3
    x = rng.randn(2, 5, 6, D + C).astype(np.float32)
    out = np.asarray(LS.depth_feature_outer_product(jnp.asarray(x), D, C))
    assert out.shape == (2, 5, 6, D, C)
    depth = np.exp(x[..., :D]) / np.exp(x[..., :D]).sum(-1, keepdims=True)
    feat = x[..., D:]
    expected = np.einsum('bhwd,bhwc->bhwdc', depth, feat)
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # depth distribution sums to 1 over D
    np.testing.assert_allclose(out.sum(3), depth.sum(-1)[..., None] * feat, atol=1e-5)


def test_topk_splat_full_k_equals_dense():
    """k == D selects every bin: the sparse splat must equal the dense one
    (forward and gradient), since segment_sum order is irrelevant."""
    rng = np.random.RandomState(4)
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    B, N, D, h, w, C = 2, 3, 6, 4, 5, 7
    depth_logits = rng.randn(B, N, h, w, D).astype(np.float32)
    depth = np.exp(depth_logits) / np.exp(depth_logits).sum(-1, keepdims=True)
    feat = rng.randn(B, N, h, w, C).astype(np.float32)
    geometry = rng.uniform(-60, 60, (B, N, D, h, w, 3)).astype(np.float32)
    geometry[..., 2] = rng.uniform(-9, 9, (B, N, D, h, w))

    def dense(d, f):
        vol = d[..., None] * f[..., None, :]       # (B, N, h, w, D, C)
        return LS.lift_splat(vol, jnp.asarray(geometry), res, start, dim)

    def sparse(d, f):
        return LS.lift_splat_topk(d, f, jnp.asarray(geometry), D, res, start, dim)

    args = (jnp.asarray(depth), jnp.asarray(feat))
    out_d, vjp_d = jax.vjp(dense, *args)
    out_s, vjp_s = jax.vjp(sparse, *args)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.rand(*out_d.shape).astype(np.float32))
    for g_s, g_d in zip(vjp_s(ct), vjp_d(ct)):
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                                   rtol=1e-4, atol=1e-5)


def test_topk_splat_partial_k_matches_masked_dense():
    """k < D must equal the dense splat of the volume with non-top-k depth mass
    zeroed (selection mask under stop_gradient) — forward and gradients."""
    rng = np.random.RandomState(5)
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    B, N, D, k, h, w, C = 1, 2, 8, 3, 4, 5, 6
    depth_logits = rng.randn(B, N, h, w, D).astype(np.float32)
    depth = np.exp(depth_logits) / np.exp(depth_logits).sum(-1, keepdims=True)
    feat = rng.randn(B, N, h, w, C).astype(np.float32)
    geometry = rng.uniform(-45, 45, (B, N, D, h, w, 3)).astype(np.float32)
    geometry[..., 2] = rng.uniform(-9, 9, (B, N, D, h, w))

    def masked_dense(d, f):
        _, idx = jax.lax.top_k(d, k)
        mask = jax.lax.stop_gradient(
            jax.nn.one_hot(idx, D, dtype=d.dtype).sum(-2))   # (B,N,h,w,D) 0/1
        vol = (d * mask)[..., None] * f[..., None, :]
        return LS.lift_splat(vol, jnp.asarray(geometry), res, start, dim)

    def sparse(d, f):
        return LS.lift_splat_topk(d, f, jnp.asarray(geometry), k, res, start, dim)

    args = (jnp.asarray(depth), jnp.asarray(feat))
    out_m, vjp_m = jax.vjp(masked_dense, *args)
    out_s, vjp_s = jax.vjp(sparse, *args)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    # top-3 of 8 keeps under half the mass rows; result must differ from dense
    vol_full = jnp.asarray(depth)[..., None] * jnp.asarray(feat)[..., None, :]
    out_dense = LS.lift_splat(vol_full, jnp.asarray(geometry), res, start, dim)
    assert float(jnp.abs(out_s - out_dense).max()) > 1e-4
    ct = jnp.asarray(rng.rand(*out_m.shape).astype(np.float32))
    for g_s, g_m in zip(vjp_s(ct), vjp_m(ct)):
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_m),
                                   rtol=1e-4, atol=1e-5)


def test_topk_splat_sort_carry_variant_equivalent(monkeypatch):
    """FIERY_TOPK_SELECT=sort (variadic sort carrying ids) must reproduce the
    FIERY_TOPK_SELECT=topk path bit-for-bit — values and gradients (both
    produce descending-value slot order, unlike the 'nosort' default)."""
    rng = np.random.RandomState(6)
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    B, N, D, k, h, w, C = 1, 2, 8, 3, 4, 5, 6
    depth_logits = rng.randn(B, N, h, w, D).astype(np.float32)
    depth = np.exp(depth_logits) / np.exp(depth_logits).sum(-1, keepdims=True)
    # inject exact ties to exercise the stable-sort tie rule
    depth[0, 0, 0, 0, 2] = depth[0, 0, 0, 0, 5]
    feat = rng.randn(B, N, h, w, C).astype(np.float32)
    geometry = rng.uniform(-45, 45, (B, N, D, h, w, 3)).astype(np.float32)
    geometry[..., 2] = rng.uniform(-9, 9, (B, N, D, h, w))
    args = (jnp.asarray(depth), jnp.asarray(feat))

    def run(d, f):
        return LS.lift_splat_topk(d, f, jnp.asarray(geometry), k, res, start, dim)

    monkeypatch.setenv('FIERY_TOPK_SELECT', 'topk')
    out_g, vjp_g = jax.vjp(run, *args)
    monkeypatch.setenv('FIERY_TOPK_SELECT', 'sort')
    out_s, vjp_s = jax.vjp(run, *args)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_g))
    ct = jnp.asarray(rng.rand(*out_g.shape).astype(np.float32))
    for g_s, g_g in zip(vjp_s(ct), vjp_g(ct)):
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                                   rtol=1e-6, atol=1e-7)


def test_topk_splat_nosort_variant_equivalent(monkeypatch):
    """FIERY_TOPK_NOSORT=1 (radix-select + rank compaction, no sort) must pick
    the exact same (weight, bin) multiset as the top_k path — including the
    lowest-index tie rule — so the splat output and gradients match up to f32
    reduction order."""
    rng = np.random.RandomState(7)
    res, start, dim = calculate_birds_eye_view_parameters(X_BOUND, Y_BOUND, Z_BOUND)
    B, N, D, k, h, w, C = 1, 2, 8, 3, 4, 5, 6
    depth_logits = rng.randn(B, N, h, w, D).astype(np.float32)
    depth = np.exp(depth_logits) / np.exp(depth_logits).sum(-1, keepdims=True)
    # exact ties straddling the k-th boundary to exercise the tie rule
    depth[0, 0, 0, 0, :] = np.float32([.3, .2, .2, .2, .02, .02, .03, .03])
    feat = rng.randn(B, N, h, w, C).astype(np.float32)
    geometry = rng.uniform(-45, 45, (B, N, D, h, w, 3)).astype(np.float32)
    geometry[..., 2] = rng.uniform(-9, 9, (B, N, D, h, w))

    # selection-set identity (order-independent): compare sorted (w, id) pairs
    from fiery_tpu.ops.lift_splat import _topk_select_nosort, voxel_ids
    ids = jnp.moveaxis(voxel_ids(jnp.asarray(geometry), res, start, dim), 2, 4)
    tw_ref, ti_ref = jax.lax.top_k(jnp.asarray(depth), k)
    ids_ref = jnp.take_along_axis(ids, ti_ref, axis=-1)
    tw_ns, ids_ns = _topk_select_nosort(jnp.asarray(depth), ids, k)

    def canon(wv, iv):
        key = np.asarray(iv).astype(np.int64) * 10**6 + \
            (np.asarray(wv) * 10**5).astype(np.int64)
        order = np.argsort(key, axis=-1)
        return (np.take_along_axis(np.asarray(wv), order, -1),
                np.take_along_axis(np.asarray(iv), order, -1))

    w_a, i_a = canon(tw_ref, ids_ref)
    w_b, i_b = canon(tw_ns, ids_ns)
    np.testing.assert_array_equal(i_a, i_b)
    np.testing.assert_array_equal(w_a, w_b)

    # full splat fwd+bwd equivalence (reduction-order tolerance)
    args = (jnp.asarray(depth), jnp.asarray(feat))

    def run(d, f):
        return LS.lift_splat_topk(d, f, jnp.asarray(geometry), k, res, start, dim)

    monkeypatch.setenv('FIERY_TOPK_SELECT', 'topk')
    out_g, vjp_g = jax.vjp(run, *args)
    monkeypatch.setenv('FIERY_TOPK_SELECT', 'nosort')
    out_s, vjp_s = jax.vjp(run, *args)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g),
                               rtol=1e-5, atol=1e-6)
    ct = jnp.asarray(rng.rand(*out_g.shape).astype(np.float32))
    for g_s, g_g in zip(vjp_s(ct), vjp_g(ct)):
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                                   rtol=1e-5, atol=1e-6)


def test_topk_nosort_bf16_native_width_descent():
    """bf16 depth takes the 4-level u16 radix descent (half the passes of the
    f32 path); the selected (weight, bin) multiset must still match lax.top_k
    exactly — bf16 has many more exact ties, exercising the tie rule hard."""
    from fiery_tpu.ops.lift_splat import _topk_select_nosort

    rng = np.random.RandomState(11)
    for dtype in (jnp.float32, jnp.bfloat16):
        d = jnp.asarray(rng.rand(2, 3, 5, 48).astype(np.float32)).astype(dtype)
        ids = jnp.asarray(rng.randint(0, 40000, (2, 3, 5, 48)), jnp.int32)
        tw, ik = _topk_select_nosort(d, ids, 8)
        assert tw.dtype == dtype
        twr, tir = jax.lax.top_k(d, 8)
        ikr = jnp.take_along_axis(ids, tir, -1)

        def canon(w, i):
            o = np.argsort(np.asarray(i, np.int64), -1)
            return (np.take_along_axis(np.asarray(w, np.float32), o, -1),
                    np.take_along_axis(np.asarray(i), o, -1))

        w_a, i_a = canon(tw, ik)
        w_b, i_b = canon(twr, ikr)
        np.testing.assert_array_equal(i_a, i_b)
        np.testing.assert_array_equal(w_a, w_b)


def _nuscenes_like_rig(n_frames=2, jitter=0.0, seed=0):
    """6-camera rig: rotations/translations like the nuScenes sensor layout."""
    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    yaws = [55, 0, -55, 110, 180, -110]
    trans = [[1.5, 0.5, 1.5], [1.7, 0.0, 1.5], [1.5, -0.5, 1.5],
             [1.0, 0.5, 1.5], [0.0, 0.0, 1.5], [1.0, -0.5, 1.5]]
    K = np.array([[380.0, 0, 240], [0, 380.0, 110], [0, 0, 1]], np.float32)
    intr = np.zeros((n_frames, 6, 3, 3), np.float32)
    extr = np.zeros((n_frames, 6, 4, 4), np.float32)
    for f in range(n_frames):
        for n, (yaw, t) in enumerate(zip(yaws, trans)):
            a = np.radians(yaw + jitter * rng.randn())
            c, s = np.cos(a), np.sin(a)
            rotz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            E = np.eye(4, dtype=np.float32)
            E[:3, :3] = rotz @ base
            E[:3, 3] = np.asarray(t) + jitter * rng.randn(3) * 0.1
            intr[f, n] = K
            extr[f, n] = E
    return intr, extr


def test_depth_plane_cull_small_grid_counts():
    """Fishing-like small grid: most far depth planes are provably OOB; the
    100x100 baseline grid culls (almost) nothing — the measured refutation."""
    frustum = LS.create_frustum((224, 480), 8, (2.0, 50.0, 1.0))
    intr, extr = _nuscenes_like_rig(n_frames=3, jitter=0.5, seed=1)

    res, start, dim = (np.asarray(x) for x in
                       calculate_birds_eye_view_parameters(
                           [-9.6, 9.6, 0.1], [-16.0, 16.0, 0.1],
                           [-10.0, 10.0, 20.0]))
    keep_small = LS.compute_depth_plane_keep(frustum, intr, extr,
                                             res, start, dim)
    assert (keep_small < 30).all(), keep_small   # most of 48 planes culled
    assert (keep_small >= 5).all(), keep_small   # near planes always kept

    res, start, dim = (np.asarray(x) for x in
                       calculate_birds_eye_view_parameters(
                           [-50.0, 50.0, 0.5], [-50.0, 50.0, 0.5],
                           [-10.0, 10.0, 20.0]))
    keep_big = LS.compute_depth_plane_keep(frustum, intr, extr, res, start, dim)
    assert (keep_big >= 46).all(), keep_big      # ~nothing cullable at 100x100


def test_depth_plane_cull_exact_splat():
    """Culled splat == full splat (forward AND gradient) for poses inside the
    envelope, on a small grid where ~2/3 of the planes are culled."""
    frustum = LS.create_frustum((64, 96), 8, (2.0, 26.0, 1.0))
    intr, extr = _nuscenes_like_rig(n_frames=2, jitter=0.3, seed=2)
    K = np.array([[76.0, 0, 48], [0, 76.0, 30], [0, 0, 1]], np.float32)
    intr[..., :, :] = K
    res, start, dim = (np.asarray(x) for x in
                       calculate_birds_eye_view_parameters(
                           [-8.0, 8.0, 0.5], [-8.0, 8.0, 0.5],
                           [-10.0, 10.0, 20.0]))
    keep = LS.compute_depth_plane_keep(frustum, intr, extr, res, start, dim)
    assert keep.sum() < 0.8 * 24 * 6, keep       # real culling happened

    geometry = LS.get_geometry(jnp.asarray(frustum), jnp.asarray(intr),
                               jnp.asarray(extr))            # (2, 6, D, h, w, 3)
    rng = np.random.RandomState(3)
    D, h, w = frustum.shape[0], 64 // 8, 96 // 8
    feats = jnp.asarray(rng.rand(2, 6, h, w, D, 5).astype(np.float32))

    def full(f):
        return LS.lift_splat(f, geometry, res, start, dim)

    def culled(f):
        return LS.lift_splat(f, geometry, res, start, dim, depth_keep=tuple(keep))

    out_full, vjp_full = jax.vjp(full, feats)
    out_cull, vjp_cull = jax.vjp(culled, feats)
    np.testing.assert_allclose(np.asarray(out_cull), np.asarray(out_full),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.rand(*out_full.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(vjp_cull(ct)[0]),
                               np.asarray(vjp_full(ct)[0]),
                               rtol=1e-5, atol=1e-5)
