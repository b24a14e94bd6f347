"""Accuracy cost of the approximation levers (round-2 VERDICT missing #2).

The round-2 throughput levers — ``LIFT.TOPK`` (sparse top-k splat),
``LIFT.WARP_FREE`` (ego-motion folded into the lift geometry) and
``MODEL.TEMPORAL_MODEL.TRIM_TRAIN`` (train-time causal trim, changed BN batch
stats) — are *approximations*: the reference computes the exact dense splat
(/root/reference/fiery/models/fiery.py:221-273). This harness bounds what they
cost in accuracy, with two experiments (CPU, learnable synthetic dataset):

``train`` — train the model to convergence in each lever mode from the same
init/data and report IoU / VPQ (full protocol: zero-noise eval, host instance
matching) under (a) the mode's own serving config and (b) the exact dense
parity serving config; plus the dense-trained checkpoint cross-served with
each lever (the pure *serving* lever case, e.g. the +54% topk8 serving win).

``activation`` — with a *trained* (low depth entropy) vs *random* (high
entropy) checkpoint, measure the BEV-feature and head-output error
distributions of topk-k vs dense on the same inputs, alongside the
depth-softmax entropy and top-k captured-mass distributions that drive them.

Usage:
    python tools/accuracy_ab.py train      [--steps 400] [--out report.json]
    python tools/accuracy_ab.py activation [--steps 400] [--out report.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# --platform axon runs the study on the real TPU chip (fast steps, slow
# compiles); default stays CPU. Must be decided before first backend use.
if '--platform' in sys.argv:
    _plat = sys.argv[sys.argv.index('--platform') + 1]
else:
    _plat = 'cpu'
if _plat != 'axon':
    jax.config.update('jax_platforms', _plat)
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_fiery_tpu')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

# enough depth bins (24) that keeping k=8 is a real approximation (1/3 of the
# mass carriers), multi-camera ring, 64x64 BEV, 2 past + 2 future frames
BASE = {
    'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 2, 'PRECISION': 32,
    'BATCHSIZE': 4,
    'IMAGE': {'FINAL_DIM': (32, 48), 'NAMES': ['CAM_A', 'CAM_B', 'CAM_C',
                                               'CAM_D']},
    'LIFT': {'X_BOUND': [-12.0, 12.0, 0.375], 'Y_BOUND': [-12.0, 12.0, 0.375],
             'D_BOUND': [2.0, 26.0, 1.0]},
    'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 24},
              'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 24},
              'DISTRIBUTION': {'LATENT_DIM': 8},
              'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1},
              'BN_MOMENTUM': 0.05},
    'OPTIMIZER': {'LR': 1e-3},
}

MODES = {
    'dense': {},
    'topk8': {'LIFT': {'TOPK': 8}},
    'warpfree': {'LIFT': {'WARP_FREE': True}},
    'topk8_warpfree': {'LIFT': {'TOPK': 8, 'WARP_FREE': True}},
    'trimtrain': {'MODEL': {'TEMPORAL_MODEL': {'TRIM_TRAIN': True}}},
    'all': {'LIFT': {'TOPK': 8, 'WARP_FREE': True},
            'MODEL': {'TEMPORAL_MODEL': {'TRIM_TRAIN': True}}},
}

N_TRAIN, N_VAL = 16, 8


def _dense_cache_path(steps):
    """Cache file for the dense-trained state, fingerprinted by the settings
    that determine it (step count + BASE cfg + train-set size) so a stale
    state from an earlier run with different settings is never reused."""
    import hashlib
    key = json.dumps({'steps': steps, 'base': BASE, 'n_train': N_TRAIN},
                     sort_keys=True)
    return ('/tmp/acc_dense_state_'
            + hashlib.sha1(key.encode()).hexdigest()[:12] + '.pkl')


def _merge(base, extra):
    out = {k: (dict(v) if isinstance(v, dict) else v) for k, v in base.items()}
    for k, v in extra.items():
        if isinstance(v, dict):
            sub = out.setdefault(k, {})
            for k2, v2 in v.items():
                if isinstance(v2, dict):
                    sub.setdefault(k2, {}).update(v2)
                else:
                    sub[k2] = v2
        else:
            out[k] = v
    return out


def _cfg(mode_overrides):
    from fiery_tpu.utils.config import get_cfg
    return get_cfg(cfg_dict=_merge(BASE, mode_overrides))


def _val_batches(cfg):
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    # val seed far beyond train seed+index range: disjoint scripted scenes.
    # Uploaded to device ONCE here — evaluate_state runs many times (curve /
    # multi-seed study) and re-uploading through the dev tunnel dominates.
    ds = SyntheticFutureDataset(cfg, n_samples=N_VAL, n_instances=3, seed=1000)
    return [{k: jnp.asarray(v) for k, v in ds.get_batch([i]).items()}
            for i in range(N_VAL)]


def train_mode(mode, steps, log_every=50, seed=0, eval_hook=None,
               eval_every=0):
    """Train one lever mode; returns (state, losses).

    ``seed`` varies init / batch order / step rng (train data stays the same
    scripted scenes, so seed spread measures run noise, not data noise).
    ``eval_hook(state, step_i)`` runs every ``eval_every`` steps (VPQ curve).
    """
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.training.trainer import Trainer

    cfg = _cfg(MODES[mode])
    if mode not in _TRAIN_STEP_CACHE:
        trainer = Trainer(cfg)

        def step_full(state, full, idx, rng, _trainer=trainer):
            # batch selection INSIDE the jit: the whole (tiny) train set lives
            # on device and each step dispatches ONE call with a (B,) index
            # vector — no per-step host->device batch upload (1.2 MB/step
            # through the 1-3 MB/s dev tunnel would otherwise dominate)
            batch = jax.tree.map(lambda a: a[idx], full)
            return _trainer.train_step(state, batch, rng)

        _TRAIN_STEP_CACHE[mode] = (
            jax.jit(trainer.init_state),
            jax.jit(step_full, donate_argnums=(0,)))
    init_state, step = _TRAIN_STEP_CACHE[mode]
    ds = SyntheticFutureDataset(cfg, n_samples=N_TRAIN, n_instances=3, seed=0)
    order = np.random.RandomState(7 + 1000 * seed)
    full = {k: jnp.asarray(v)
            for k, v in ds.get_batch(list(range(N_TRAIN))).items()}
    state = init_state(jax.random.key(seed),
                       jax.tree.map(lambda a: a[:cfg.BATCHSIZE], full))

    losses_dev = []
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(order.choice(N_TRAIN, size=cfg.BATCHSIZE,
                                       replace=False))
        state, metrics = step(state, full, idx,
                              jax.random.fold_in(jax.random.key(1 + seed), i))
        losses_dev.append(metrics['total_loss'])   # device scalar, no sync
        if (i + 1) % log_every == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f'[{mode} s{seed}] step {i + 1}/{steps} '
                  f'loss={float(losses_dev[-1]):.4f} '
                  f'({rate:.2f} steps/s)', flush=True)
        if eval_hook is not None and eval_every and (i + 1) % eval_every == 0:
            eval_hook(state, i + 1)
    losses = [float(v) for v in np.asarray(jnp.stack(losses_dev))]
    return state, losses


_EVAL_STEP_CACHE = {}
_TRAIN_STEP_CACHE = {}


def _cached_eval_step(serve_overrides):
    """One compiled eval step per serving config per process — the VPQ curve
    calls evaluate_state every eval_every steps, and a fresh jit would
    recompile each time (minutes per point on the TPU backend)."""
    key = json.dumps(serve_overrides, sort_keys=True)
    if key not in _EVAL_STEP_CACHE:
        from fiery_tpu.training.trainer import Trainer
        trainer = Trainer(_cfg(serve_overrides))
        _EVAL_STEP_CACHE[key] = jax.jit(trainer.eval_step)
    return _EVAL_STEP_CACHE[key]


def evaluate_state(state, serve_overrides, val_batches):
    """Full eval protocol under a serving config: zero-noise forward, IoU
    (dynamic class) + VPQ with host instance matching, full-grid crop."""
    from fiery_tpu.postprocess.instance import (
        predict_instance_segmentation_and_trajectories)
    from fiery_tpu.training.metrics import IntersectionOverUnion, PanopticMetric

    eval_step = _cached_eval_step(serve_overrides)
    iou = IntersectionOverUnion(2)
    pan = PanopticMetric(2)
    for b in val_batches:
        bj = {k: jnp.asarray(v) for k, v in b.items()}
        output, labels, _ = eval_step(state, bj)
        # compress before the device->host pull (1-3.6 MB/s dev tunnel)
        seg_pred = np.asarray(
            jnp.argmax(output['segmentation'], -1).astype(jnp.uint8))
        seg_label = np.asarray(labels['segmentation'].astype(jnp.uint8))
        consistent = predict_instance_segmentation_and_trajectories(output)
        iou.update(seg_pred.astype(np.int32), seg_label.astype(np.int32))
        pan.update(np.asarray(consistent).astype(np.int32),
                   np.asarray(labels['instance'].astype(jnp.int16))
                   .astype(np.int32))
    return {'iou': float(iou.compute()[1]),
            'vpq': float(pan.compute()['pq'][1])}


def run_train_study(steps, out_path, seeds=(0,)):
    """Per-mode x per-seed train + eval. With >=3 seeds the table reports
    mean +/- sd so lever deltas can be judged against seed noise (the 200-step
    single-seed round-3 table could not — VERDICT r4 weak #3)."""
    results = {}
    val = _val_batches(_cfg({}))
    dense_state = None
    for mode in MODES:
        per_seed = []
        for seed in seeds:
            state, losses = train_mode(mode, steps, seed=seed)
            row = {
                'seed': seed,
                'final_loss_mean_last50': float(np.mean(losses[-50:])),
                'eval_matched': evaluate_state(state, MODES[mode], val),
                'eval_dense_parity': evaluate_state(state, MODES['dense'], val),
            }
            per_seed.append(row)
            print(f'== {mode} seed {seed}: {json.dumps(row)}', flush=True)
            if mode == 'dense' and seed == seeds[0]:
                dense_state = state
                # cache for run_activation_study (same BASE cfg) so it need
                # not retrain the dense reference; fingerprinted by
                # (steps, BASE, n_train) so stale states are never reused
                import pickle
                with open(_dense_cache_path(steps), 'wb') as f:
                    pickle.dump(jax.device_get(dense_state), f)

        def agg(path_a, path_b):
            vals = [r[path_a][path_b] for r in per_seed]
            return {'mean': round(float(np.mean(vals)), 4),
                    'sd': round(float(np.std(vals)), 4), 'values': vals}

        results[mode] = {
            'per_seed': per_seed,
            'iou_matched': agg('eval_matched', 'iou'),
            'vpq_matched': agg('eval_matched', 'vpq'),
            'iou_dense_parity': agg('eval_dense_parity', 'iou'),
            'vpq_dense_parity': agg('eval_dense_parity', 'vpq'),
        }
        print(f'== {mode} aggregate: iou {results[mode]["iou_matched"]} '
              f'vpq {results[mode]["vpq_matched"]}', flush=True)

    # serving-only levers on the dense-trained checkpoint (seed 0)
    cross = {}
    for serve in ['topk8', 'warpfree', 'topk8_warpfree']:
        cross[serve] = evaluate_state(dense_state, MODES[serve], val)
        print(f'== dense-trained, served {serve}: {json.dumps(cross[serve])}',
              flush=True)
    results['dense_trained_cross_serving'] = cross

    with open(out_path, 'w') as f:
        json.dump({'steps': steps, 'seeds': list(seeds), 'n_train': N_TRAIN,
                   'n_val': N_VAL, 'base_cfg': BASE, 'results': results}, f,
                  indent=1)
    print(f'wrote {out_path}')
    return results


def run_curve_study(max_steps, eval_every, out_path, seed=0):
    """Budget diagnostic (VERDICT r4 next #3): train DENSE only, eval the full
    IoU/VPQ protocol every ``eval_every`` steps — find the first budget where
    instance grouping emerges (VPQ > 0) so the lever study can be powered
    correctly. Also the first end-to-end exercise of
    decode -> temporal consistency -> VPQ on *learned* predictions."""
    val = _val_batches(_cfg({}))
    curve = []

    def hook(state, step_i):
        t0 = time.time()
        scores = evaluate_state(state, MODES['dense'], val)
        curve.append({'step': step_i, **scores})
        print(f'== curve step {step_i}: {json.dumps(scores)} '
              f'(eval {time.time() - t0:.0f}s)', flush=True)
        with open(out_path, 'w') as f:
            json.dump({'max_steps': max_steps, 'eval_every': eval_every,
                       'seed': seed, 'n_train': N_TRAIN, 'curve': curve}, f,
                      indent=1)

    state, _ = train_mode('dense', max_steps, seed=seed, eval_hook=hook,
                          eval_every=eval_every)
    print(f'wrote {out_path}')
    return curve


# ---------------------------------------------------------------------------
def _normalise(image, dtype):
    from fiery_tpu.models.fiery import _IMAGENET_MEAN, _IMAGENET_STD
    image = (image.astype(jnp.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    return image.astype(dtype)


def _bev_features(state, overrides, batch):
    """(b, s, X, Y, C) present-frame BEV features under a serving config,
    shared params. The dense path's post-splat cumulative warp is applied so
    dense and warp-free outputs live in the same (present) frame — exactly the
    two branches of Fiery.__call__."""
    from fiery_tpu.models.fiery import build_fiery
    from fiery_tpu.ops.warp import cumulative_warp_features
    model = build_fiery(_cfg(overrides))
    variables = {'params': state.params['model'],
                 'batch_stats': state.batch_stats}

    def bev(m, image, intrinsics, extrinsics, ego):
        c = m.cfg
        rf = c.receptive_field
        image = _normalise(image[:, :rf], c.compute_dtype)
        ego_in = ego[:, :rf]
        x = m.calculate_birds_eye_view_features(
            image, intrinsics[:, :rf], extrinsics[:, :rf], False,
            egomotion=ego_in if c.warp_free else None)
        if not c.warp_free:
            x = cumulative_warp_features(x, ego_in, mode='bilinear',
                                         spatial_extent=c.spatial_extent)
        return x
    return model.apply(variables, jnp.asarray(batch['image']),
                       jnp.asarray(batch['intrinsics']),
                       jnp.asarray(batch['extrinsics']),
                       jnp.asarray(batch['future_egomotion']), method=bev)


def _head_outputs(state, overrides, batch):
    from fiery_tpu.training.trainer import Trainer
    trainer = Trainer(_cfg(overrides))
    output, _, _ = jax.jit(trainer.eval_step)(
        state, {k: jnp.asarray(v) for k, v in batch.items()})
    return output


def _depth_stats(state, batch, k):
    """Depth-softmax entropy + top-k captured mass per pixel, via the bare
    Encoder applied on the model's encoder param subtree."""
    from fiery_tpu.models.encoder import Encoder
    from fiery_tpu.models.fiery import FieryConfig
    c = FieryConfig.from_cfg(_cfg({'LIFT': {'TOPK': k}}))
    enc = Encoder(out_channels=c.encoder_out_channels,
                  depth_channels=c.depth_channels,
                  version=c.encoder_name.split('-')[1],
                  downsample=c.encoder_downsample,
                  use_depth_distribution=c.use_depth_distribution,
                  bn_momentum=c.bn_momentum, dtype=c.compute_dtype)
    variables = {
        'params': state.params['model']['bev_lift']['encoder'],
        'batch_stats': state.batch_stats['bev_lift']['encoder'],
    }
    img = jnp.asarray(batch['image'])
    rf = c.receptive_field
    img = img[:, :rf]
    b, s, n = img.shape[:3]
    img = _normalise(img.reshape(b * s * n, *img.shape[3:]), c.compute_dtype)
    depth, _ = enc.apply(variables, img, False, True)   # (bn, h, w, D)
    depth = np.asarray(depth, np.float64)
    entropy = -(depth * np.log(np.clip(depth, 1e-12, None))).sum(-1)
    topk_mass = np.sort(depth, axis=-1)[..., -k:].sum(-1)
    return entropy.ravel(), topk_mass.ravel()


def _err_percentiles(ref, approx):
    ref = np.asarray(ref, np.float64).ravel()
    approx = np.asarray(approx, np.float64).ravel()
    err = np.abs(approx - ref)
    scale = max(np.abs(ref).max(), 1e-12)
    rel = err / scale
    return {f'p{p}': float(np.percentile(rel, p)) for p in (50, 90, 99, 100)}


def run_activation_study(steps, out_path):
    """BEV-feature / head-output error of topk8 & warp-free vs dense, under a
    random (high-entropy) and a trained (low-entropy) depth head."""
    from fiery_tpu.data.synthetic import SyntheticFutureDataset
    from fiery_tpu.training.trainer import Trainer

    cfg = _cfg({})
    ds = SyntheticFutureDataset(cfg, n_samples=2, n_instances=3, seed=1000)
    batch = ds.get_batch([0, 1])

    trainer = Trainer(cfg)
    b0 = {k: jnp.asarray(v) for k, v in batch.items()}
    random_state = jax.jit(trainer.init_state)(jax.random.key(0), b0)
    if os.path.exists(_dense_cache_path(steps)):
        import pickle
        with open(_dense_cache_path(steps), 'rb') as f:
            trained_state = pickle.load(f)
        print('loaded dense-trained state from the train study '
              f'({_dense_cache_path(steps)})', flush=True)
    else:
        trained_state, _ = train_mode('dense', steps)

    report = {}
    for tag, state in [('random_init', random_state),
                       ('trained', trained_state)]:
        entropy, mass = _depth_stats(state, batch, k=8)
        row = {
            'depth_entropy_nats': {
                'p50': float(np.percentile(entropy, 50)),
                'p90': float(np.percentile(entropy, 90)),
                'uniform_is': float(np.log(cfg.LIFT.D_BOUND[1] - cfg.LIFT.D_BOUND[0])),
            },
            'top8_captured_mass': {
                'p10': float(np.percentile(mass, 10)),
                'p50': float(np.percentile(mass, 50)),
            },
        }
        bev_dense = _bev_features(state, MODES['dense'], batch)
        for lever in ['topk8', 'warpfree', 'topk8_warpfree']:
            bev = _bev_features(state, MODES[lever], batch)
            row[f'bev_feature_rel_err_{lever}'] = _err_percentiles(bev_dense, bev)
        out_dense = _head_outputs(state, MODES['dense'], batch)
        for lever in ['topk8', 'warpfree']:
            out = _head_outputs(state, MODES[lever], batch)
            row[f'seg_logit_rel_err_{lever}'] = _err_percentiles(
                out_dense['segmentation'], out['segmentation'])
        report[tag] = row
        print(f'== {tag}: {json.dumps(row, indent=1)}', flush=True)

    with open(out_path, 'w') as f:
        json.dump(report, f, indent=1)
    print(f'wrote {out_path}')
    return report


def main():
    global N_TRAIN
    parser = argparse.ArgumentParser()
    parser.add_argument('study', choices=['train', 'activation', 'curve'])
    parser.add_argument('--steps', type=int, default=400)
    parser.add_argument('--seeds', type=int, default=1,
                        help='train study: number of seeds per mode')
    parser.add_argument('--eval-every', type=int, default=250,
                        help='curve study: eval cadence in steps')
    parser.add_argument('--n-train', type=int, default=None,
                        help='override the training-set size (default 16)')
    parser.add_argument('--platform', default='cpu',
                        help="'cpu' (default) or 'axon' (real TPU)")
    parser.add_argument('--out', default=None)
    args = parser.parse_args()
    if args.n_train is not None:
        N_TRAIN = args.n_train
    out = args.out or f'/tmp/accuracy_ab_{args.study}.json'
    if args.study == 'train':
        run_train_study(args.steps, out, seeds=tuple(range(args.seeds)))
    elif args.study == 'curve':
        run_curve_study(args.steps, args.eval_every, out)
    else:
        run_activation_study(args.steps, out)


if __name__ == '__main__':
    main()
