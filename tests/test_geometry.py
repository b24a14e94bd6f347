import pytest
import numpy as np
import jax.numpy as jnp

from fiery_tpu.utils import geometry as G

pytestmark = pytest.mark.fast


def random_pose_vec(rng, shape=()):
    # keep rotations away from gimbal lock (|ry| < pi/2)
    t = rng.uniform(-5, 5, shape + (3,))
    r = rng.uniform(-1.0, 1.0, shape + (3,)) * np.array([1.5, 1.2, 1.5])
    return np.concatenate([t, r], axis=-1).astype(np.float32)


def test_pose_vec_mat_roundtrip():
    rng = np.random.RandomState(0)
    vec = random_pose_vec(rng, (16,))
    mat = G.pose_vec2mat(vec)
    vec2 = G.mat2pose_vec(mat)
    np.testing.assert_allclose(np.asarray(vec2), vec, atol=1e-5)


def test_pose_mat_is_rigid():
    rng = np.random.RandomState(1)
    vec = random_pose_vec(rng, (8,))
    mat = np.asarray(G.pose_vec2mat(vec))
    R = mat[:, :3, :3]
    np.testing.assert_allclose(R @ np.swapaxes(R, 1, 2), np.broadcast_to(np.eye(3), (8, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(mat[:, 3], np.broadcast_to([0, 0, 0, 1], (8, 4)), atol=0)


def test_invert_pose_matrix():
    rng = np.random.RandomState(2)
    vec = random_pose_vec(rng, (8,))
    mat = G.pose_vec2mat(vec)
    inv = G.invert_pose_matrix(mat)
    prod = np.asarray(mat @ inv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_euler2mat_matches_torch_convention():
    """R = Rx @ Ry @ Rz (reference geometry.py:138)."""
    angle = np.array([[0.3, -0.2, 0.7]], dtype=np.float32)
    out = np.asarray(G.euler2mat(angle))[0]

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rx(0.3) @ ry(-0.2) @ rz(0.7)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_update_intrinsics():
    K = jnp.array([[100.0, 0, 50], [0, 120.0, 60], [0, 0, 1]])
    K2 = np.asarray(G.update_intrinsics(K, top_crop=10, left_crop=4,
                                        scale_width=0.5, scale_height=0.25))
    assert K2[0, 0] == 50.0
    assert K2[0, 2] == 0.5 * 50 - 4
    assert K2[1, 1] == 30.0
    assert K2[1, 2] == 0.25 * 60 - 10
    assert K2[2, 2] == 1.0


def test_bev_parameters():
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-50.0, 50.0, 0.5], [-50.0, 50.0, 0.5], [-10.0, 10.0, 20.0])
    np.testing.assert_allclose(res, [0.5, 0.5, 20.0])
    np.testing.assert_allclose(start, [-49.75, -49.75, 0.0])
    np.testing.assert_array_equal(dim, [200, 200, 1])


def test_bev_parameters_fishing():
    res, start, dim = G.calculate_birds_eye_view_parameters(
        [-16.0, 16.0, 0.1], [-9.6, 9.7, 0.1], [-10.0, 10.0, 20.0])
    # (9.7 - -9.6)/0.1 = 192.999... -> trunc 192, matching the reference long() cast
    np.testing.assert_array_equal(dim, [320, 192, 1])


def test_pack_unpack_sequence():
    x = jnp.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
    packed = G.pack_sequence_dim(x)
    assert packed.shape == (6, 4, 5)
    unpacked = G.unpack_sequence_dim(packed, 2, 3)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(x))
