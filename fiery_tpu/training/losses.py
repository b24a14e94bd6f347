"""Training losses, channels-last.

Functional parity with /root/reference/fiery/losses.py and the uncertainty weighting in
trainer.py:89-117: top-k hardest-pixel weighted CE for segmentation, L1/L2 spatial
regression with ignore masks, closed-form diagonal-Gaussian KL, and learned
homoscedastic task weights (log-variance parameters).
"""

import functools

import jax
import jax.numpy as jnp


def _kth_largest(x, k):
    """Exact k-th largest along the last axis, radix select on float bits.

    TPU-native replacement for ``lax.top_k(x, k)[0][..., -1]``: top_k lowers to a
    full (bitonic) sort, ~15 ms at the segmentation-loss shape (15, 40000) with
    k=10000. Here: map f32 to order-preserving uint32, then descend 8 levels of
    4-bit dense histograms (broadcast compare + reduce — no sort, no scatter;
    random-access scatter runs at only ~55M rows/s on TPU). Exact for any k and
    any tie structure. Returns shape x.shape[:-1] + (1,).
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    # order-preserving map: nonneg -> set sign bit; neg -> flip all bits
    u = jnp.where((bits >> 31) == 0, bits | jnp.uint32(0x80000000), ~bits)
    prefix = jnp.zeros(x.shape[:-1] + (1,), jnp.uint32)    # known high bits of kth
    rank = jnp.full(x.shape[:-1] + (1,), k, jnp.int32)     # rank within prefix group
    buckets = jnp.arange(16, dtype=jnp.uint32)
    for level in range(8):
        shift = 28 - 4 * level
        active = ((u >> jnp.uint32(shift + 4)) == (prefix >> jnp.uint32(shift + 4))
                  if level else jnp.ones(u.shape, bool))
        b = (u >> jnp.uint32(shift)) & jnp.uint32(0xF)
        onehot = (b[..., None] == buckets) & active[..., None]
        hist = onehot.sum(axis=-2)                         # (..., 16)
        # cnt_ge[j] = #active elements in buckets >= j (non-increasing in j)
        cnt_ge = jnp.cumsum(hist[..., ::-1], axis=-1)[..., ::-1]
        bstar = jnp.sum((cnt_ge >= rank).astype(jnp.int32), axis=-1,
                        keepdims=True) - 1                 # largest j: cnt_ge >= rank
        # 16-lane one-hot select instead of take_along_axis (pure bandwidth;
        # same trick as segmentation_loss's one-hot CE)
        cnt_gt = jnp.sum(
            jnp.where(buckets.astype(jnp.int32) == bstar, cnt_ge - hist, 0),
            axis=-1, keepdims=True)
        rank = rank - cnt_gt
        prefix = prefix | (bstar.astype(jnp.uint32) << jnp.uint32(shift))
    out = jnp.where((prefix >> 31) == 1, prefix ^ jnp.uint32(0x80000000), ~prefix)
    return jax.lax.bitcast_convert_type(out, jnp.float32)


def _top_k_sum_from_threshold(loss, kth, k):
    """Sum of the k largest entries given the exact k-th value: strictly-greater
    entries plus the right multiplicity of the threshold value (exact under ties)."""
    gt = (loss > kth).astype(loss.dtype)
    sum_gt = jnp.sum(loss * gt, axis=-1)
    cnt_gt = jnp.sum(gt, axis=-1)
    return sum_gt + (k - cnt_gt) * kth[..., 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _top_k_mean(loss, k):
    """Mean of the k largest entries along the last axis (averaged over all dims).

    Forward matches jnp.mean(lax.top_k(loss, k)[0]) exactly (same multiset of
    values, via radix select instead of sort); the custom backward is a threshold
    mask (grad distributed over entries >= the k-th value) instead of a scatter
    through sort indices — both the full sort and the index scatter are
    TPU-hostile. With ties at the threshold the mask subgradient spreads the same
    total gradient over the tied entries (a valid subgradient; exact when untied).
    """
    kth = _kth_largest(loss, k)
    n_rows = loss.size // loss.shape[-1]
    return jnp.sum(_top_k_sum_from_threshold(loss, kth, k)) / (n_rows * k)


def _top_k_mean_fwd(loss, k):
    kth = _kth_largest(loss, k)
    n_rows = loss.size // loss.shape[-1]
    mean = jnp.sum(_top_k_sum_from_threshold(loss, kth, k)) / (n_rows * k)
    return mean, (loss, kth)


def _top_k_mean_bwd(k, res, g):
    loss, kth = res
    mask = (loss >= kth).astype(loss.dtype)
    count = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1.0)
    n_rows = loss.size // loss.shape[-1]
    # total gradient per row = g * k / (n_rows * k) = g / n_rows, spread over the mask
    d = g * mask * (k / count) / (n_rows * k)
    return (d,)


_top_k_mean.defvjp(_top_k_mean_fwd, _top_k_mean_bwd)


def spatial_regression_loss(prediction, target, norm, ignore_index=255,
                            future_discount=1.0):
    """L1/L2 regression with an ignore mask and per-timestep future discount.

    prediction/target: (b, s, h, w, c). The ignore mask is taken from the first target
    channel (identical across channels). Reference: losses.py:6-37.
    """
    assert prediction.ndim == 5, 'Must be a 5D tensor'
    mask = target[..., :1] != ignore_index                    # (b, s, h, w, 1)
    if norm == 1:
        loss = jnp.abs(prediction - target)
    elif norm == 2:
        loss = (prediction - target) ** 2
    else:
        raise ValueError(f'Expected norm 1 or 2, got {norm}')

    loss = jnp.sum(loss, axis=-1, keepdims=True)              # sum channels

    s = loss.shape[1]
    discounts = future_discount ** jnp.arange(s, dtype=loss.dtype)
    loss = loss * discounts[None, :, None, None, None]

    mask_f = mask.astype(loss.dtype)
    denom = jnp.sum(mask_f)
    total = jnp.sum(loss * mask_f)
    # empty mask -> zero loss (reference losses.py:24-25)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def segmentation_loss(prediction, target, class_weights, ignore_index=255,
                      use_top_k=False, top_k_ratio=1.0, future_discount=1.0):
    """Per-pixel weighted CE + future discount + top-k hardest pixels.

    prediction: (b, s, h, w, n_classes) logits; target: (b, s, h, w) int labels.
    Reference: losses.py:40-77 (torch cross_entropy zeroes ignored pixels but keeps
    them in the mean denominator after top-k selection — reproduced exactly).
    """
    b, s, h, w, _ = prediction.shape
    class_weights = jnp.asarray(class_weights, dtype=prediction.dtype)

    logp = jax.nn.log_softmax(prediction, axis=-1)
    tgt = jnp.clip(target, 0, prediction.shape[-1] - 1)
    # One-hot contraction instead of take_along_axis / table lookup: per-pixel
    # row gathers over b*s*h*w rows run at the ~55M rows/s transaction floor
    # (the r5 trace billed this gather ~29 ms, trace-inflated but real), while
    # for the 2-class head an elementwise select is pure bandwidth. Exact:
    # one-hot rows are exact {0,1} and logp/class_weights are finite.
    # FIERY_ONEHOT_CE=0 restores the gather lowering (A/B).
    import os
    if os.environ.get('FIERY_ONEHOT_CE', '1') == '1':
        onehot = jax.nn.one_hot(tgt, prediction.shape[-1], dtype=logp.dtype)
        nll = -jnp.sum(logp * onehot, axis=-1)
        weights = jnp.sum(class_weights * onehot, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        weights = class_weights[tgt]
    valid = (target != ignore_index)
    loss = jnp.where(valid, nll * weights, 0.0)               # (b, s, h, w)

    discounts = future_discount ** jnp.arange(s, dtype=loss.dtype)
    loss = loss * discounts[None, :, None, None]

    loss = loss.reshape(b, s, h * w)
    if use_top_k:
        k = int(top_k_ratio * h * w)
        return _top_k_mean(loss, k)
    return jnp.mean(loss)


def probabilistic_loss(output):
    """KL(future || present) for diagonal Gaussians, summed over the latent dim,
    averaged over batch. Reference: losses.py:80-96.
    """
    present_mu = output['present_mu']
    present_log_sigma = output['present_log_sigma']
    future_mu = output['future_mu']
    future_log_sigma = output['future_log_sigma']

    var_future = jnp.exp(2.0 * future_log_sigma)
    var_present = jnp.exp(2.0 * present_log_sigma)
    kl_div = (
        present_log_sigma - future_log_sigma - 0.5
        + (var_future + (future_mu - present_mu) ** 2) / (2.0 * var_present)
    )
    return jnp.mean(jnp.sum(kl_div, axis=-1))


def init_uncertainty_weights(instance_flow_enabled=True):
    """Learned homoscedastic log-variance task weights (reference trainer.py:42-64)."""
    weights = {
        'segmentation_weight': jnp.zeros(()),
        'centerness_weight': jnp.zeros(()),
        'offset_weight': jnp.zeros(()),
    }
    if instance_flow_enabled:
        weights['flow_weight'] = jnp.zeros(())
    return weights


def compute_losses(output, labels, uncertainty_weights, cfg):
    """Full loss dict, matching reference trainer.py:88-117.

    cfg is a CfgNode; labels holds 'segmentation' (b,s,h,w), 'centerness' (b,s,h,w,1),
    'offset' (b,s,h,w,2), optionally 'flow' (b,s,h,w,2).
    """
    uw = uncertainty_weights
    loss = {}

    seg_factor = 1.0 / jnp.exp(uw['segmentation_weight'])
    loss['segmentation'] = seg_factor * segmentation_loss(
        output['segmentation'], labels['segmentation'],
        class_weights=jnp.asarray(cfg.SEMANTIC_SEG.WEIGHTS),
        ignore_index=cfg.DATASET.IGNORE_INDEX,
        use_top_k=cfg.SEMANTIC_SEG.USE_TOP_K,
        top_k_ratio=cfg.SEMANTIC_SEG.TOP_K_RATIO,
        future_discount=cfg.FUTURE_DISCOUNT,
    )
    loss['segmentation_uncertainty'] = 0.5 * uw['segmentation_weight']

    center_factor = 1.0 / (2.0 * jnp.exp(uw['centerness_weight']))
    loss['instance_center'] = center_factor * spatial_regression_loss(
        output['instance_center'], labels['centerness'], norm=2,
        future_discount=cfg.FUTURE_DISCOUNT,
    )
    loss['centerness_uncertainty'] = 0.5 * uw['centerness_weight']

    offset_factor = 1.0 / (2.0 * jnp.exp(uw['offset_weight']))
    loss['instance_offset'] = offset_factor * spatial_regression_loss(
        output['instance_offset'], labels['offset'], norm=1,
        ignore_index=cfg.DATASET.IGNORE_INDEX,
        future_discount=cfg.FUTURE_DISCOUNT,
    )
    loss['offset_uncertainty'] = 0.5 * uw['offset_weight']

    if cfg.INSTANCE_FLOW.ENABLED:
        flow_factor = 1.0 / (2.0 * jnp.exp(uw['flow_weight']))
        loss['instance_flow'] = flow_factor * spatial_regression_loss(
            output['instance_flow'], labels['flow'], norm=1,
            ignore_index=cfg.DATASET.IGNORE_INDEX,
            future_discount=cfg.FUTURE_DISCOUNT,
        )
        loss['flow_uncertainty'] = 0.5 * uw['flow_weight']

    if cfg.PROBABILISTIC.ENABLED:
        loss['probabilistic'] = cfg.PROBABILISTIC.WEIGHT * probabilistic_loss(output)

    return loss
