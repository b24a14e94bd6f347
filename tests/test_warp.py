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


# ---------------------------------------------------------------------------
# warp-free lift: point-space inverse of the warp affine
# ---------------------------------------------------------------------------

def test_warp_points_to_present_inverts_affine_grid():
    """warp_points_to_present must be the exact point-space inverse of the
    sampling affine warp_features builds: pushing every present pixel centre
    through the _affine_grid sampling map (present -> source) and then through
    warp_points_to_present (source -> present) must return the original metric
    coordinates — for arbitrary yaw/translation AND asymmetric X/Y extents
    (the aspect term a = h_x/h_y in the derivation).
    """
    rng = np.random.RandomState(0)
    H, W_ = 20, 10
    x_bound, y_bound = (-50.0, 50.0), (-25.0, 25.0)
    extent = (x_bound[1], y_bound[1])  # FieryConfig.spatial_extent convention
    c_x, h_x = (x_bound[0] + x_bound[1]) / 2, (x_bound[1] - x_bound[0]) / 2
    c_y, h_y = (y_bound[0] + y_bound[1]) / 2, (y_bound[1] - y_bound[0]) / 2
    flow = jnp.asarray(rng.randn(4, 6).astype(np.float32))

    theta = W._warp_theta(flow, extent, jnp.float32)
    grid = W._affine_grid(theta, H, W_)            # (b, H, W, 2) normalised (gx, gy)
    # normalised -> metric: X = c_x + h_x * gy (row axis), Y = c_y + h_y * gx
    src = jnp.stack([c_x + h_x * grid[..., 1], c_y + h_y * grid[..., 0]], axis=-1)
    back = W.warp_points_to_present(src, flow, extent, (x_bound, y_bound))

    xs = c_x + h_x * ((2.0 * np.arange(H, dtype=np.float64) + 1.0) / H - 1.0)
    ys = c_y + h_y * ((2.0 * np.arange(W_, dtype=np.float64) + 1.0) / W_ - 1.0)
    expect = np.broadcast_to(
        np.stack(np.meshgrid(xs, ys, indexing='ij'), axis=-1), back.shape)
    # f32 roundtrip at ~50 m coordinate scale: eps*scale*(a few ops) ~ 3e-5
    np.testing.assert_allclose(np.asarray(back), expect, atol=1e-4)


def test_warp_free_splat_matches_warped_splat_integer_shift():
    """For a pure translation of an integer number of BEV cells, bilinear
    warping is an exact cell shift, so splat-then-warp and transform-then-splat
    must agree exactly (away from grid borders, where splat-then-warp loses
    points that left the frame-t grid).
    """
    from fiery_tpu.ops.lift_splat import voxel_ids, splat_to_bev

    rng = np.random.RandomState(1)
    res, nbins = 0.5, 40
    lo = -nbins / 2 * res
    bounds = ((lo, -lo), (lo, -lo))
    extent = (-lo, -lo)
    bev_resolution = np.array([res, res, 20.0])
    bev_start = np.array([lo + res / 2, lo + res / 2, 0.0])
    bev_dim = np.array([nbins, nbins, 1])

    # points strictly interior under both the original and the shifted grid
    P = 500
    pts = np.zeros((P, 3), np.float32)
    pts[:, :2] = rng.uniform(lo + 4 * res, -lo - 4 * res, size=(P, 2))
    feats = rng.rand(P, 3).astype(np.float32)

    flow = np.zeros((1, 6), np.float32)
    flow[0, 0] = 3 * res      # forward translation, 3 cells
    flow[0, 1] = -2 * res     # side translation, 2 cells

    ids = voxel_ids(jnp.asarray(pts), bev_resolution, bev_start, bev_dim)
    bev = splat_to_bev(jnp.asarray(feats), ids, bev_dim)
    warped = W.warp_features(bev[None], jnp.asarray(flow), mode='bilinear',
                             spatial_extent=extent)[0]

    moved = W.warp_points_to_present(jnp.asarray(pts[None, :, :2]),
                                     jnp.asarray(flow), extent, bounds)[0]
    pts2 = np.concatenate([np.asarray(moved), pts[:, 2:]], axis=-1)
    ids2 = voxel_ids(jnp.asarray(pts2), bev_resolution, bev_start, bev_dim)
    direct = splat_to_bev(jnp.asarray(feats), ids2, bev_dim)

    # compare away from the borders the warp zero-fills
    m = 4
    np.testing.assert_allclose(np.asarray(warped[m:-m, m:-m]),
                               np.asarray(direct[m:-m, m:-m]), atol=1e-5)
    assert float(jnp.abs(direct).sum()) > 0


def test_fiery_warp_free_forward():
    """Full model forward with LIFT.WARP_FREE: runs, finite, and with zero
    egomotion it is bit-identical to the warped path (bilinear warp by the
    identity pose is exact)."""
    from fiery_tpu.models.fiery import Fiery, FieryConfig

    base = dict(final_dim=(32, 48), x_bound=(-4.0, 4.0, 0.5), y_bound=(-4.0, 4.0, 0.5),
                d_bound=(2.0, 10.0, 1.0), encoder_name='efficientnet-b0',
                encoder_out_channels=16, start_out_channels=16,
                n_future_frames=1, n_gru_blocks=1, n_res_layers=1, latent_dim=4)
    rng = np.random.RandomState(0)
    b, s, n = 1, 3, 2
    img = jnp.asarray(rng.rand(b, s, n, 32, 48, 3).astype(np.float32))
    intr = jnp.tile(jnp.asarray(np.array([[20.0, 0, 24], [0, 20.0, 16], [0, 0, 1]],
                                         np.float32)), (b, s, n, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, s, n, 1, 1))
    ego0 = jnp.zeros((b, s, 6), jnp.float32)

    m_free = Fiery(FieryConfig(warp_free=True, **base))
    m_warp = Fiery(FieryConfig(warp_free=False, **base))
    rngs = {'params': jax.random.key(0), 'sample': jax.random.key(1)}
    v = m_free.init(rngs, img, intr, extr, ego0, train=False)
    out_free = m_free.apply(v, img, intr, extr, ego0, train=False)
    out_warp = m_warp.apply(v, img, intr, extr, ego0, train=False)
    for k in out_free:
        if out_free[k] is None:
            continue
        assert bool(jnp.isfinite(out_free[k]).all()), k
        np.testing.assert_array_equal(np.asarray(out_free[k]), np.asarray(out_warp[k]))

    # non-zero egomotion: still runs and stays finite (different discretisation)
    ego = jnp.asarray(rng.randn(b, s, 6).astype(np.float32) * 0.1)
    out2 = m_free.apply(v, img, intr, extr, ego, train=False)
    assert all(v2 is None or bool(jnp.isfinite(v2).all()) for v2 in out2.values())

def test_fiery_warp_free_composes_with_topk_and_grad():
    """LIFT.WARP_FREE + LIFT.TOPK together (the serving combo): train-mode
    forward+grad through the composed pose fold, top-k selection, and splat
    stays finite — the ego-motion gradient path now runs through
    warp_points_to_present into the splat ids (stop-gradient'd bins) and the
    bilinear-free geometry, not through grid_sample."""
    from fiery_tpu.models.fiery import Fiery, FieryConfig

    cfg = FieryConfig(final_dim=(32, 48), x_bound=(-4.0, 4.0, 0.5),
                      y_bound=(-4.0, 4.0, 0.5), d_bound=(2.0, 10.0, 0.5),
                      encoder_name='efficientnet-b0', encoder_out_channels=16,
                      start_out_channels=16, n_future_frames=1, n_gru_blocks=1,
                      n_res_layers=1, latent_dim=4, warp_free=True, depth_topk=8)
    model = Fiery(cfg)
    rng = np.random.RandomState(3)
    b, s, n = 1, 3, 2
    img = jnp.asarray(rng.rand(b, s, n, 32, 48, 3).astype(np.float32))
    intr = jnp.tile(jnp.asarray(np.array([[20.0, 0, 24], [0, 20.0, 16], [0, 0, 1]],
                                         np.float32)), (b, s, n, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, s, n, 1, 1))
    ego = jnp.asarray(rng.randn(b, s, 6).astype(np.float32) * 0.1)
    # future-distribution conditioning labels: (b, 1+n_future, X, Y, C_lbl)
    fdi = jnp.asarray(rng.rand(b, 2, 16, 16, 7).astype(np.float32))
    rngs = {'params': jax.random.key(0), 'sample': jax.random.key(1)}
    variables = model.init(rngs, img, intr, extr, ego, fdi, train=True)

    def loss_fn(params):
        out, _ = model.apply({**variables, 'params': params}, img, intr, extr, ego,
                             fdi, train=True, rngs=rngs, mutable=['batch_stats'])
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in out.values()
                   if v is not None)

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert bool(jnp.isfinite(loss))
    finite = jax.tree.map(lambda g: bool(jnp.isfinite(g).all()), grads)
    assert all(jax.tree.leaves(finite))
