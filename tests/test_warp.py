"""Parity tests for the warp stack against torch's affine_grid/grid_sample (CPU).

The reference warps BEV features with torch F.affine_grid + F.grid_sample
(geometry.py:219-220, align_corners=False, zero padding). These tests pin our NHWC
jnp implementation to torch's behaviour bit-for-bit up to float tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from fiery_tpu.ops import warp as W
from fiery_tpu.utils.geometry import pose_vec2mat, mat2pose_vec, invert_pose_matrix


def torch_warp_features(x_nchw, flow, mode, spatial_extent):
    """Direct re-statement of the reference warp (geometry.py:181-222) for oracle use."""
    x = torch.as_tensor(x_nchw)
    flow = torch.as_tensor(flow)
    b = x.shape[0]
    angle = flow[:, 5].clone()
    translation = flow[:, :2].clone()
    translation[:, 0] /= spatial_extent[0]
    translation[:, 1] /= spatial_extent[1]
    translation[:, 0] *= -1
    cos_t, sin_t = torch.cos(angle), torch.sin(angle)
    transformation = torch.stack([cos_t, -sin_t, translation[:, 1],
                                  sin_t, cos_t, translation[:, 0]], dim=-1).view(b, 2, 3)
    grid = F.affine_grid(transformation, size=list(x.shape), align_corners=False)
    return F.grid_sample(x, grid.float(), mode=mode, padding_mode='zeros',
                         align_corners=False).numpy()


@pytest.mark.parametrize('mode', ['bilinear', 'nearest'])
def test_grid_sample_matches_torch(mode):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 13, 17, 3).astype(np.float32).reshape(10, 13, 17, 3)
    grid = rng.uniform(-1.3, 1.3, (10, 13, 17, 2)).astype(np.float32)

    ours = np.asarray(W.grid_sample_2d(jnp.asarray(x), jnp.asarray(grid), mode=mode))

    x_t = torch.as_tensor(x).permute(0, 3, 1, 2)
    ref = F.grid_sample(x_t, torch.as_tensor(grid), mode=mode, padding_mode='zeros',
                        align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize('mode', ['bilinear', 'nearest'])
@pytest.mark.parametrize('hw', [(200, 200), (100, 50)])
def test_warp_features_matches_reference(mode, hw):
    rng = np.random.RandomState(1)
    h, w = hw
    b = 3
    x = rng.randn(b, 4, h, w).astype(np.float32)
    flow = np.zeros((b, 6), dtype=np.float32)
    flow[:, 0] = rng.uniform(-3, 3, b)    # tx
    flow[:, 1] = rng.uniform(-3, 3, b)    # ty
    flow[:, 5] = rng.uniform(-0.3, 0.3, b)  # rz
    extent = (50.0, 50.0)

    ref = torch_warp_features(x, flow, mode, extent)  # (b, c, h, w)
    ours = W.warp_features(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(flow),
                           mode=mode, spatial_extent=extent)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def _np_cumulative_oracle(x, flow, mode, extent, reverse):
    """Reference cumulative warps (geometry.py:225-280) restated with the torch oracle."""
    import torch as th
    flow_mat = np.asarray(pose_vec2mat(flow))
    L = x.shape[1]
    if reverse:
        out = [x[:, 0]]
        cum = None
        for i in range(1, L):
            inv = np.asarray(invert_pose_matrix(flow_mat[:, i - 1]))
            cum = inv if cum is None else cum @ inv
            vec = np.asarray(mat2pose_vec(cum))
            out.append(torch_warp_features(x[:, i], vec, mode, extent))
        return np.stack(out, 1)
    else:
        out = [x[:, -1]]
        cum = flow_mat[:, -2]
        for t in reversed(range(L - 1)):
            vec = np.asarray(mat2pose_vec(cum))
            out.append(torch_warp_features(x[:, t], vec, mode, extent))
            if t > 0:
                cum = flow_mat[:, t - 1] @ cum
        return np.stack(out[::-1], 1)


@pytest.mark.parametrize('reverse', [False, True])
def test_cumulative_warps_match_oracle(reverse):
    rng = np.random.RandomState(2)
    b, t, c, h, w = 2, 4, 3, 40, 40
    x = rng.randn(b, t, c, h, w).astype(np.float32)
    flow = np.zeros((b, t, 6), dtype=np.float32)
    flow[..., 0] = rng.uniform(-2, 2, (b, t))
    flow[..., 1] = rng.uniform(-2, 2, (b, t))
    flow[..., 5] = rng.uniform(-0.2, 0.2, (b, t))
    extent = (20.0, 20.0)

    oracle = _np_cumulative_oracle(x, flow, 'bilinear', extent, reverse)

    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    fn = W.cumulative_warp_features_reverse if reverse else W.cumulative_warp_features
    ours = np.asarray(fn(x_nhwc, jnp.asarray(flow), mode='bilinear', spatial_extent=extent))
    ours = ours.transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_warp_identity():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 16, 2).astype(np.float32))
    flow = jnp.zeros((1, 6))
    out = W.warp_features(x, flow, mode='bilinear', spatial_extent=(8.0, 8.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_patch_gather_matches_four_tap_and_grad(monkeypatch):
    """The 2x2-patch-gather bilinear path == the 4-tap path, values AND
    gradients (the backward becomes a single patch scatter-add), including
    points far outside the image (zero padding)."""
    import fiery_tpu.ops.warp as W

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(13, 17, 5).astype(np.float32))
    # grid spanning far out of range on purpose
    grid = jnp.asarray((rng.rand(9, 11, 2).astype(np.float32) * 4.0 - 2.0))

    def run():
        def f(im):
            return W.grid_sample_2d(im, grid, mode='bilinear')
        out, vjp = jax.vjp(f, img)
        ct = jnp.asarray(rng.rand(*out.shape).astype(np.float32))
        return np.asarray(out), np.asarray(vjp(ct)[0])

    monkeypatch.setenv('FIERY_PATCH_WARP', '0')
    rng = np.random.RandomState(1)
    out4, g4 = run()
    monkeypatch.setenv('FIERY_PATCH_WARP', '1')
    rng = np.random.RandomState(1)
    outp, gp = run()
    np.testing.assert_allclose(outp, out4, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(gp, g4, rtol=1e-6, atol=1e-6)


def test_pair_gather_matches_four_tap_and_grad(monkeypatch):
    """The (1,2,C) row-pair-gather bilinear path == the 4-tap path, values AND
    gradients, including points far outside the image (zero padding) and the
    exact column boundaries x0 = -1 / W-1 / W where the W-pad + clamp + mask
    interplay matters."""
    import fiery_tpu.ops.warp as W

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(13, 17, 5).astype(np.float32))
    grid = np.asarray(rng.rand(9, 11, 2).astype(np.float32) * 4.0 - 2.0)
    # pin a few exact boundary columns (align_corners=False unnormalise:
    # ix = ((gx+1)*W - 1)/2  =>  gx = (2*ix + 1)/W - 1)
    Wd = img.shape[1]
    for j, ix in enumerate((-1.0, -0.5, 0.0, Wd - 1.0, Wd - 0.5, float(Wd))):
        grid[0, j, 0] = (2.0 * ix + 1.0) / Wd - 1.0
    grid = jnp.asarray(grid)

    def run():
        def f(im):
            return W.grid_sample_2d(im, grid, mode='bilinear')
        out, vjp = jax.vjp(f, img)
        ct = jnp.asarray(rng.rand(*out.shape).astype(np.float32))
        return np.asarray(out), np.asarray(vjp(ct)[0])

    monkeypatch.setenv('FIERY_PAIR_WARP', '0')
    rng = np.random.RandomState(1)
    out4, g4 = run()
    monkeypatch.setenv('FIERY_PAIR_WARP', '1')
    rng = np.random.RandomState(1)
    outp, gp = run()
    np.testing.assert_allclose(outp, out4, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(gp, g4, rtol=1e-6, atol=1e-6)
