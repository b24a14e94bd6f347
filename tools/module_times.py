"""Per-module fwd / fwd+bwd timings for the post-lift stack at baseline shapes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from fiery_tpu.utils.config import get_cfg
from fiery_tpu.models.fiery import FieryConfig
from fiery_tpu.models.temporal_model import TemporalModel
from fiery_tpu.models.future_prediction import FuturePrediction
from fiery_tpu.models.decoder import Decoder
from fiery_tpu.ops.warp import cumulative_warp_features

cfg = get_cfg(cfg_dict={'MODEL': {'BN_MOMENTUM': 0.05}, 'PRECISION': 16})
mc = FieryConfig.from_cfg(cfg)
dt = jnp.bfloat16
key = jax.random.key(0)


def timeit(name, fn, *args, n=10):
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1e3
    print(f'{name:<40s} {ms:8.1f} ms  (compile {c:.0f}s)', flush=True)


def fwd_and_bwd(name, module, x, train=True):
    variables = jax.jit(module.init, static_argnames='train')(
        {'params': key, 'dropout': key}, x, train=True)

    def fwd(v, x):
        out, _ = module.apply(v, x, train=True, mutable=['batch_stats'],
                              rngs={'dropout': key})
        return out

    timeit(f'{name} fwd', fwd, variables, x)

    def loss(p, x):
        out = fwd({'params': p, 'batch_stats': variables.get('batch_stats', {})}, x)
        return jax.tree.reduce(lambda a, b: a + b,
                               jax.tree.map(lambda t: t.astype(jnp.float32).sum(), out))

    def fwdbwd(p, x):
        return jax.grad(loss)(p, x)

    timeit(f'{name} fwd+bwd', fwdbwd, variables['params'], x)


# 1. feature warp (6 past frames, bilinear)
x = jax.random.normal(key, (3, 3, 200, 200, 64), dt)
ego = jax.random.normal(key, (3, 3, 6), jnp.float32) * 0.1
timeit('cumulative_warp fwd', lambda a, e: cumulative_warp_features(
    a, e, mode='bilinear', spatial_extent=(50.0, 50.0)), x, ego)
timeit('cumulative_warp fwd+bwd', jax.grad(
    lambda a, e: cumulative_warp_features(
        a, e, mode='bilinear', spatial_extent=(50.0, 50.0)).astype(jnp.float32).sum()),
    x, ego)

# 2. temporal model on (3, 3, 200, 200, 70)
tm = TemporalModel(receptive_field=mc.receptive_field, input_shape=mc.bev_size,
                   start_out_channels=mc.start_out_channels,
                   extra_in_channels=mc.extra_in_channels,
                   n_spatial_layers_between_temporal_layers=mc.inbetween_layers,
                   use_pyramid_pooling=mc.pyramid_pooling,
                   bn_momentum=mc.bn_momentum, dtype=dt)
xt = jax.random.normal(key, (3, 3, 200, 200, 70), dt)
fwd_and_bwd('temporal_model (3,3,200,200,70)', tm, xt)

# 3. future prediction: latent input (3, 4, 200, 200, 32) + hidden (3, 200, 200, 64)
fp = FuturePrediction(in_channels=64, n_gru_blocks=mc.n_gru_blocks,
                      n_res_layers=mc.n_res_layers, bn_momentum=mc.bn_momentum,
                      dtype=dt)
lat = jax.random.normal(key, (3, 4, 200, 200, 32), dt)
hid = jax.random.normal(key, (3, 200, 200, 64), dt)
fp_vars = jax.jit(fp.init, static_argnames='train')({'params': key}, lat, hid,
                                                    train=True)

def fp_fwd(v, lat, hid):
    out, _ = fp.apply(v, lat, hid, train=True, mutable=['batch_stats'])
    return out

timeit('future_prediction fwd', fp_fwd, fp_vars, lat, hid)
timeit('future_prediction fwd+bwd', jax.jit(
    lambda p, lat, hid: jax.grad(
        lambda pp: fp_fwd({'params': pp, 'batch_stats': fp_vars['batch_stats']},
                          lat, hid).astype(jnp.float32).sum())(p)),
    fp_vars['params'], lat, hid)

# 4. decoder on (3, 5, 200, 200, 64)
dec = Decoder(n_classes=mc.n_classes, predict_future_flow=True,
              bn_momentum=mc.bn_momentum, dtype=dt)
xd = jax.random.normal(key, (3, 5, 200, 200, 64), dt)
dec_vars = jax.jit(dec.init, static_argnames='train')({'params': key}, xd, train=True)

def dec_fwd(v, x):
    out, _ = dec.apply(v, x, train=True, mutable=['batch_stats'])
    return {k: o for k, o in out.items() if o is not None}

timeit('decoder fwd', dec_fwd, dec_vars, xd)
timeit('decoder fwd+bwd', jax.jit(
    lambda p, x: jax.grad(
        lambda pp: sum(o.astype(jnp.float32).sum() for o in dec_fwd(
            {'params': pp, 'batch_stats': dec_vars['batch_stats']}, x).values()))(p)),
    dec_vars['params'], xd)

# 5. losses on random outputs
from fiery_tpu.training.losses import compute_losses, init_uncertainty_weights
output = {
    'segmentation': jax.random.normal(key, (3, 5, 200, 200, 2), jnp.float32),
    'instance_center': jax.nn.sigmoid(jax.random.normal(key, (3, 5, 200, 200, 1), jnp.float32)),
    'instance_offset': jax.random.normal(key, (3, 5, 200, 200, 2), jnp.float32),
    'instance_flow': jax.random.normal(key, (3, 5, 200, 200, 2), jnp.float32),
    'present_mu': jnp.zeros((3, 1, 32)), 'present_log_sigma': jnp.zeros((3, 1, 32)),
    'future_mu': jnp.zeros((3, 1, 32)), 'future_log_sigma': jnp.zeros((3, 1, 32)),
}
labels = {
    'segmentation': jax.random.randint(key, (3, 5, 200, 200), 0, 2),
    'centerness': jax.random.uniform(key, (3, 5, 200, 200, 1)),
    'offset': jax.random.normal(key, (3, 5, 200, 200, 2)),
    'flow': jax.random.normal(key, (3, 5, 200, 200, 2)),
}
uw = init_uncertainty_weights(True)
timeit('losses fwd', lambda o, l, u: sum(compute_losses(o, l, u, cfg).values()),
       output, labels, uw)
timeit('losses fwd+bwd', jax.grad(
    lambda o, l, u: sum(compute_losses(o, l, u, cfg).values())), output, labels, uw)
