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
