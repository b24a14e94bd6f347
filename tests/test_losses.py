"""Loss parity tests against a torch oracle re-stating the reference losses.py."""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from fiery_tpu.training import losses as L

pytestmark = pytest.mark.fast


def torch_segmentation_loss(prediction, target, class_weights, ignore_index,
                            use_top_k, top_k_ratio, future_discount):
    """Reference losses.py:40-77 restated (prediction NCHW-style (b, s, c, h, w))."""
    prediction = torch.as_tensor(prediction)
    target = torch.as_tensor(target)
    b, s, c, h, w = prediction.shape
    prediction = prediction.reshape(b * s, c, h, w)
    target_f = target.reshape(b * s, h, w)
    loss = F.cross_entropy(prediction, target_f, ignore_index=ignore_index,
                           reduction='none', weight=torch.as_tensor(class_weights))
    loss = loss.view(b, s, h, w)
    discounts = future_discount ** torch.arange(s, dtype=loss.dtype)
    loss = loss * discounts.view(1, s, 1, 1)
    loss = loss.view(b, s, -1)
    if use_top_k:
        k = int(top_k_ratio * loss.shape[2])
        loss, _ = torch.sort(loss, dim=2, descending=True)
        loss = loss[:, :, :k]
    return loss.mean().item()


def torch_spatial_regression_loss(prediction, target, norm, ignore_index,
                                  future_discount):
    """Reference losses.py:6-37 restated (NCHW-style (b, s, c, h, w))."""
    prediction = torch.as_tensor(prediction)
    target = torch.as_tensor(target)
    mask = target[:, :, :1] != ignore_index
    if mask.sum() == 0:
        return 0.0
    fn = F.l1_loss if norm == 1 else F.mse_loss
    loss = fn(prediction, target, reduction='none')
    loss = torch.sum(loss, dim=-3, keepdims=True)
    s = loss.shape[1]
    discounts = future_discount ** torch.arange(s, dtype=loss.dtype)
    loss = loss * discounts.view(1, s, 1, 1, 1)
    return loss[mask].mean().item()


def test_segmentation_loss_matches_reference():
    rng = np.random.RandomState(0)
    b, s, c, h, w = 2, 3, 2, 8, 10
    logits = rng.randn(b, s, c, h, w).astype(np.float32)
    target = rng.randint(0, c, (b, s, h, w))
    target[0, 0, :2, :2] = 255  # some ignored pixels
    for use_top_k, ratio in [(False, 1.0), (True, 0.25)]:
        expected = torch_segmentation_loss(logits, target, [1.0, 2.0], 255,
                                           use_top_k, ratio, 0.95)
        ours = L.segmentation_loss(
            jnp.asarray(logits.transpose(0, 1, 3, 4, 2)), jnp.asarray(target),
            class_weights=[1.0, 2.0], ignore_index=255,
            use_top_k=use_top_k, top_k_ratio=ratio, future_discount=0.95)
        np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_spatial_regression_loss_matches_reference():
    rng = np.random.RandomState(1)
    b, s, c, h, w = 2, 3, 2, 8, 10
    pred = rng.randn(b, s, c, h, w).astype(np.float32)
    target = rng.randn(b, s, c, h, w).astype(np.float32)
    target[0, :, :, :3] = 255.0  # ignored region (all channels)
    for norm in (1, 2):
        expected = torch_spatial_regression_loss(pred, target, norm, 255, 0.95)
        ours = L.spatial_regression_loss(
            jnp.asarray(pred.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(target.transpose(0, 1, 3, 4, 2)),
            norm=norm, ignore_index=255, future_discount=0.95)
        np.testing.assert_allclose(float(ours), expected, rtol=1e-4)


def test_spatial_regression_empty_mask_is_zero():
    pred = jnp.ones((1, 2, 4, 4, 2))
    target = jnp.full((1, 2, 4, 4, 2), 255.0)
    assert float(L.spatial_regression_loss(pred, target, norm=1)) == 0.0


def test_probabilistic_loss_closed_form():
    """KL(N(mu_f, s_f) || N(mu_p, s_p)) summed over latent, vs direct formula."""
    rng = np.random.RandomState(2)
    b, latent = 3, 4
    pm = rng.randn(b, 1, latent).astype(np.float32)
    pls = rng.randn(b, 1, latent).astype(np.float32) * 0.3
    fm = rng.randn(b, 1, latent).astype(np.float32)
    fls = rng.randn(b, 1, latent).astype(np.float32) * 0.3
    out = {'present_mu': jnp.asarray(pm), 'present_log_sigma': jnp.asarray(pls),
           'future_mu': jnp.asarray(fm), 'future_log_sigma': jnp.asarray(fls)}
    ours = float(L.probabilistic_loss(out))
    kl = (pls - fls - 0.5
          + (np.exp(2 * fls) + (fm - pm) ** 2) / (2 * np.exp(2 * pls)))
    expected = kl.sum(-1).mean()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)
    # KL of identical distributions is zero
    out_same = {'present_mu': jnp.asarray(pm), 'present_log_sigma': jnp.asarray(pls),
                'future_mu': jnp.asarray(pm), 'future_log_sigma': jnp.asarray(pls)}
    np.testing.assert_allclose(float(L.probabilistic_loss(out_same)), 0.0, atol=1e-6)


def test_uncertainty_weight_factors():
    from fiery_tpu.utils.config import get_cfg
    cfg = get_cfg()
    uw = L.init_uncertainty_weights(True)
    assert set(uw) == {'segmentation_weight', 'centerness_weight', 'offset_weight',
                       'flow_weight'}
    rng = np.random.RandomState(3)
    b, s, h, w = 1, 5, 6, 6
    output = {
        'segmentation': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_center': jnp.asarray(rng.rand(b, s, h, w, 1).astype(np.float32)),
        'instance_offset': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_flow': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'present_mu': jnp.zeros((b, 1, 4)), 'present_log_sigma': jnp.zeros((b, 1, 4)),
        'future_mu': jnp.ones((b, 1, 4)), 'future_log_sigma': jnp.zeros((b, 1, 4)),
    }
    labels = {
        'segmentation': jnp.asarray(rng.randint(0, 2, (b, s, h, w))),
        'centerness': jnp.asarray(rng.rand(b, s, h, w, 1).astype(np.float32)),
        'offset': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'flow': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
    }
    loss = L.compute_losses(output, labels, uw, cfg)
    expected_keys = {'segmentation', 'segmentation_uncertainty', 'instance_center',
                     'centerness_uncertainty', 'instance_offset', 'offset_uncertainty',
                     'instance_flow', 'flow_uncertainty', 'probabilistic'}
    assert set(loss) == expected_keys
    # with zero-initialised weights, uncertainty terms are 0 and factors are 1 / 0.5
    assert float(loss['segmentation_uncertainty']) == 0.0
    # KL(N(1,1)||N(0,1)) = 0.5 per dim, 4 dims, x100 weight
    np.testing.assert_allclose(float(loss['probabilistic']), 100.0 * 2.0, rtol=1e-5)


def test_top_k_mean_gradient_matches_sort_autodiff():
    """Threshold-mask backward == autodiff through top_k when values are untied."""
    import jax
    from fiery_tpu.training.losses import _top_k_mean
    rng = np.random.RandomState(5)
    loss = jnp.asarray(rng.rand(2, 3, 40).astype(np.float32))  # untied w.p. 1
    k = 10
    g_ours = jax.grad(lambda l: _top_k_mean(l, k))(loss)
    g_ref = jax.grad(lambda l: jnp.mean(jax.lax.top_k(l, k)[0]))(loss)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=1e-7)
    # forward values equal too
    np.testing.assert_allclose(float(_top_k_mean(loss, k)),
                               float(jnp.mean(jax.lax.top_k(loss, k)[0])), rtol=1e-6)


def test_kth_largest_radix_select_exact():
    """_kth_largest is bit-exact vs lax.top_k across ties, signs and denormals."""
    import jax
    from fiery_tpu.training.losses import _kth_largest, _top_k_mean
    rng = np.random.RandomState(0)
    cases = [
        rng.randn(4, 7, 1000).astype(np.float32) * 100,
        np.where(rng.rand(3, 5, 2000) < 0.7, 0.0,
                 rng.rand(3, 5, 2000)).astype(np.float32),   # heavy zero ties
        np.full((2, 3, 500), 3.25, np.float32),              # all equal
        np.round(rng.randn(5, 800) * 3).astype(np.float32),  # mixed-sign ties
        rng.rand(2, 300).astype(np.float32) * 1e-38,         # denormal range
    ]
    for x in cases:
        xj = jnp.asarray(x)
        for k in (1, 7, x.shape[-1] // 4, x.shape[-1]):
            ref_kth = np.asarray(jax.lax.top_k(xj, k)[0][..., -1:])
            got = np.asarray(_kth_largest(xj, k))
            np.testing.assert_array_equal(got, ref_kth)
            # mean of top-k via the threshold formula matches the sorted mean
            ref_mean = float(jnp.mean(jax.lax.top_k(xj, k)[0]))
            got_mean = float(_top_k_mean(xj.reshape(-1, x.shape[-1]), k))
            # reduction order differs (masked sum vs sorted sum): fp noise only
            np.testing.assert_allclose(got_mean, ref_mean,
                                       rtol=1e-4, atol=1e-6 * max(1.0, abs(ref_mean)))
