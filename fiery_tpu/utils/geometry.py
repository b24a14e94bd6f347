"""Pure-jnp pose math and BEV grid parameters.

Functional parity with the reference geometry layer
(/root/reference/fiery/utils/geometry.py:15-178): intrinsics update under resize/crop,
BEV grid parameter derivation, Euler-angle pose <-> matrix conversions and pose inversion.
All functions are shape-polymorphic over leading batch dims and jit-friendly.
"""

import jax.numpy as jnp
import numpy as np


def update_intrinsics(intrinsics, top_crop=0.0, left_crop=0.0, scale_width=1.0, scale_height=1.0):
    """Adjust a (..., 3, 3) pinhole intrinsics matrix for resize followed by crop.

    Reference: geometry.py:15-36.
    """
    intrinsics = jnp.asarray(intrinsics)
    fx = intrinsics[..., 0, 0] * scale_width
    cx = intrinsics[..., 0, 2] * scale_width - left_crop
    fy = intrinsics[..., 1, 1] * scale_height
    cy = intrinsics[..., 1, 2] * scale_height - top_crop
    out = intrinsics
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 1, 2].set(cy)
    return out


def calculate_birds_eye_view_parameters(x_bounds, y_bounds, z_bounds):
    """Derive (resolution, start_position, dimension) of the BEV grid.

    Returns numpy arrays (static — these parametrise compiled shapes).
    Reference: geometry.py:39-58.
    """
    bounds = [x_bounds, y_bounds, z_bounds]
    bev_resolution = np.array([row[2] for row in bounds], dtype=np.float64)
    bev_start_position = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float64)
    bev_dimension = np.array(
        [int((row[1] - row[0]) / row[2]) for row in bounds], dtype=np.int64
    )
    return bev_resolution, bev_start_position, bev_dimension


def euler2mat(angle):
    """Euler angles (..., 3) [rx, ry, rz] -> rotation matrix (..., 3, 3).

    Composition order R = Rx @ Ry @ Rz, matching reference geometry.py:109-140.
    """
    angle = jnp.asarray(angle)
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cosz, sinz = jnp.cos(z), jnp.sin(z)
    cosy, siny = jnp.cos(y), jnp.sin(y)
    cosx, sinx = jnp.cos(x), jnp.sin(x)
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)

    zmat = jnp.stack([cosz, -sinz, zeros,
                      sinz, cosz, zeros,
                      zeros, zeros, ones], axis=-1).reshape(*z.shape, 3, 3)
    ymat = jnp.stack([cosy, zeros, siny,
                      zeros, ones, zeros,
                      -siny, zeros, cosy], axis=-1).reshape(*z.shape, 3, 3)
    xmat = jnp.stack([ones, zeros, zeros,
                      zeros, cosx, -sinx,
                      zeros, sinx, cosx], axis=-1).reshape(*z.shape, 3, 3)
    return xmat @ ymat @ zmat


def pose_vec2mat(vec):
    """6-DoF pose vector (..., 6) [tx, ty, tz, rx, ry, rz] -> (..., 4, 4) SE(3) matrix.

    Reference: geometry.py:143-157.
    """
    vec = jnp.asarray(vec)
    translation = vec[..., :3, None]                       # (..., 3, 1)
    rot_mat = euler2mat(vec[..., 3:])                      # (..., 3, 3)
    transform = jnp.concatenate([rot_mat, translation], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(transform[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([transform, bottom], axis=-2)   # (..., 4, 4)


def mat2pose_vec(matrix):
    """(..., 4, 4) SE(3) matrix -> 6-DoF vector [tx, ty, tz, rx, ry, rz].

    Inverse of pose_vec2mat for the Rx@Ry@Rz convention. Reference: geometry.py:82-106.
    """
    matrix = jnp.asarray(matrix)
    rotx = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    cosy = jnp.sqrt(matrix[..., 1, 2] ** 2 + matrix[..., 2, 2] ** 2)
    roty = jnp.arctan2(matrix[..., 0, 2], cosy)
    rotz = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    rotation = jnp.stack([rotx, roty, rotz], axis=-1)
    translation = matrix[..., :3, 3]
    return jnp.concatenate([translation, rotation], axis=-1)


def invert_pose_matrix(x):
    """Invert a batch of (..., 4, 4) rigid poses analytically. Reference: geometry.py:160-178."""
    x = jnp.asarray(x)
    rot_t = jnp.swapaxes(x[..., :3, :3], -1, -2)
    t = x[..., :3, 3:]
    inv = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)    # (..., 3, 4)
    bottom = jnp.zeros_like(inv[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([inv, bottom], axis=-2)


def pack_sequence_dim(x):
    """(b, s, ...) -> (b*s, ...). Reference: network.py:5-7."""
    b, s = x.shape[:2]
    return x.reshape(b * s, *x.shape[2:])


def unpack_sequence_dim(x, b, s):
    """(b*s, ...) -> (b, s, ...). Reference: network.py:10-12."""
    return x.reshape(b, s, *x.shape[1:])
