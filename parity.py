"""Accuracy-parity runner vs a released reference checkpoint.

One command, given the assets (a reference torch checkpoint such as the released
``fiery.ckpt``, and a nuScenes dataroot), reproduces the reference README metric
table (/root/reference/README.md:56-68; protocol evaluate.py:12-15,56-59) through
THIS implementation and reports the delta to the published numbers:

    python parity.py --torch-checkpoint fiery.ckpt --dataroot /data/nuscenes \
        [--version trainval] [--max-batches N] [--device-matching]

With ``--stages`` it additionally runs ONE batch through both the composed torch
reference twin (tests/torch_golden.py — reference-module-named graph the weight
importer is pinned against) and our model, loaded from the SAME checkpoint, and
prints per-stage activation max-diffs (BEV features, temporal states, latent
distribution, future rollout, decoder heads) so any metric gap can be localised
to a stage. Without ``--dataroot`` the stage diff runs on a synthetic batch and
the metric table is skipped.
"""

import argparse
from fiery_tpu.utils.config import add_platform_arg, apply_platform_arg
import os
import sys

import numpy as np


PUBLISHED = {  # reference README.md:62 (baseline.yml, nuScenes)
    'iou_100x100': 36.7, 'pq_100x100': 29.9,
}


def _stage_diffs(ckpt_path, state, cfg, batch):
    """Per-stage activation max-diffs: torch twin vs our model, same checkpoint."""
    import torch

    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    'tests'))
    from torch_golden import GoldenFiery
    from fiery_tpu.models.fiery import Fiery, FieryConfig

    model_cfg = FieryConfig.from_cfg(cfg)
    # stage comparison runs in f32 (bf16 would dominate the diffs)
    import dataclasses
    model_cfg = dataclasses.replace(model_cfg, precision=32)
    # ... and at HIGHEST matmul precision: on TPU, f32 convs/dots multiply in
    # bf16 by default, which compounds to ~1e-1 relative through the encoder
    # stack (measured on the dress-rehearsal tree) and would swamp any real
    # weight-import/graph bug the diff exists to catch. The torch twin is
    # CPU f32; match it. Scoped below via jax.default_matmul_precision.

    golden = GoldenFiery(
        C=model_cfg.encoder_out_channels, D=model_cfg.depth_channels,
        final_dim=model_cfg.final_dim, downsample=model_cfg.encoder_downsample,
        d_bound=model_cfg.d_bound, x_bound=model_cfg.x_bound,
        y_bound=model_cfg.y_bound, z_bound=model_cfg.z_bound,
        receptive_field=model_cfg.receptive_field, n_future=model_cfg.n_future,
        latent_dim=model_cfg.latent_dim,
        start_out_channels=model_cfg.start_out_channels,
        n_gru_blocks=model_cfg.n_gru_blocks, n_res_layers=model_cfg.n_res_layers,
        future_in_channels=(model_cfg.start_out_channels + model_cfg.n_future
                            * model_cfg.probabilistic_future_dim),
        version=model_cfg.encoder_name.split('-')[1])
    # the twin uses reference module names, so the reference state_dict loads
    # directly (same naming the weight importer consumes)
    blob = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    sd = blob.get('state_dict', blob) if isinstance(blob, dict) else blob
    missing, unexpected = golden.load_state_dict(
        {k[len('model.'):]: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
         if k.startswith('model.')}, strict=False)
    if missing:
        print(f'[stages] torch twin missing {len(missing)} keys '
              f'(e.g. {missing[:3]})')
    if unexpected:
        print(f'[stages] torch twin ignoring {len(unexpected)} unexpected keys '
              f'(e.g. {unexpected[:3]})')
    golden.eval()

    image = np.asarray(batch['image'], np.float32)
    if image.dtype != np.float32 or image.max() > 16.0:
        from fiery_tpu.data.nuscenes_dataset import IMAGENET_MEAN, IMAGENET_STD
        image = (image.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    intr = np.asarray(batch['intrinsics'], np.float32)
    extr = np.asarray(batch['extrinsics'], np.float32)
    ego = np.asarray(batch['future_egomotion'], np.float32)

    stages_t = {}
    rf = model_cfg.receptive_field

    def grab(name):
        def hook(_mod, _inp, out):
            stages_t[name] = out
        return hook

    golden.temporal_model.register_forward_hook(grab('temporal_states'))
    golden.future_prediction.register_forward_hook(grab('future_states'))

    image_nchw = image.transpose(0, 1, 2, 5, 3, 4)
    with torch.no_grad():
        b, s, n = image_nchw.shape[:3]
        img_p = torch.tensor(image_nchw[:, :rf])
        packed = img_p.reshape(b * rf * n, *img_p.shape[3:])
        feats = golden.encoder(packed)
        feats = feats.view(b * rf, n, *feats.shape[1:])
        geometry = golden.get_geometry(
            torch.tensor(intr[:, :rf]).reshape(b * rf, n, 3, 3),
            torch.tensor(extr[:, :rf]).reshape(b * rf, n, 4, 4))
        stages_t['bev_features'] = golden.voxel_pool(feats, geometry)
        ref_out = golden(torch.tensor(image_nchw), torch.tensor(intr),
                         torch.tensor(extr), torch.tensor(ego))

    model = Fiery(cfg=model_cfg)
    variables = {'params': state.params['model'], 'batch_stats': state.batch_stats}
    import jax
    with jax.default_matmul_precision('highest'):
        out, mods = model.apply(
            variables, jnp.asarray(image), jnp.asarray(intr), jnp.asarray(extr),
            jnp.asarray(ego), None, jnp.zeros(
                (image.shape[0], 1, model_cfg.latent_dim), jnp.float32),
            train=False, capture_intermediates=True, mutable=['intermediates'])
    inter = mods['intermediates']

    def nhwc(t):
        t = t.detach().numpy()
        return np.moveaxis(t, -3, -1)  # (..., C, H, W) -> (..., H, W, C)

    pairs = {
        'bev_features': (nhwc(stages_t['bev_features']),
                         np.asarray(inter['bev_lift']['__call__'][0], np.float32)),
        'temporal_states': (nhwc(stages_t['temporal_states']),
                            np.asarray(inter['temporal_model']['__call__'][0],
                                       np.float32)),
        'future_states': (nhwc(stages_t['future_states']),
                          np.asarray(inter['future_prediction']['__call__'][0],
                                     np.float32)),
        'present_mu': (ref_out['present_mu'].numpy(),
                       np.asarray(out['present_mu'])),
        'present_log_sigma': (ref_out['present_log_sigma'].numpy(),
                              np.asarray(out['present_log_sigma'])),
    }
    for key in ['segmentation', 'instance_center', 'instance_offset',
                'instance_flow']:
        if out.get(key) is not None:
            pairs[key] = (nhwc(ref_out[key]), np.asarray(out[key]))

    print('\nPer-stage activation diffs (torch reference twin vs fiery_tpu, '
          'same checkpoint):')
    print(f'{"stage":>20} {"max|d|":>12} {"rel(max|d|/max|ref|)":>22}')
    report = {}
    for name, (ref, got) in pairs.items():
        if ref.shape != got.shape:
            print(f'{name:>20}  SHAPE MISMATCH torch {ref.shape} vs jax {got.shape}')
            report[name] = (np.inf, np.inf)
            continue
        d = np.abs(ref.astype(np.float64) - got.astype(np.float64)).max()
        rel = d / max(np.abs(ref).max(), 1e-12)
        print(f'{name:>20} {d:12.3e} {rel:22.3e}')
        report[name] = (d, rel)
    return report


def main():
    parser = argparse.ArgumentParser(description='fiery_tpu accuracy parity')
    parser.add_argument('--torch-checkpoint', required=True, type=str,
                        help='reference Lightning checkpoint (e.g. fiery.ckpt)')
    parser.add_argument('--dataroot', default=None, type=str)
    parser.add_argument('--version', default=None, type=str)
    parser.add_argument('--max-batches', default=None, type=int)
    parser.add_argument('--device-matching', action='store_true')
    parser.add_argument('--stages', action='store_true',
                        help='also print per-stage activation diffs vs the torch '
                             'reference twin on one batch')
    add_platform_arg(parser)
    args = parser.parse_args()
    apply_platform_arg(args)

    from fiery_tpu.utils.checkpoint import load_torch_full_checkpoint
    state, cfg = load_torch_full_checkpoint(args.torch_checkpoint)

    if args.stages:
        if args.dataroot:
            cfg2 = cfg.clone()
            cfg2.defrost()
            cfg2.BATCHSIZE = 1
            cfg2.DATASET.DATAROOT = args.dataroot
            if args.version:
                cfg2.DATASET.VERSION = args.version
            cfg2.freeze()
            from fiery_tpu.data.dataset import numeric_batch, prepare_dataloaders
            _, valloader = prepare_dataloaders(cfg2)
            batch = numeric_batch(next(iter(valloader)))
        else:
            from fiery_tpu.data.synthetic import SyntheticFutureDataset
            batch = SyntheticFutureDataset(cfg, n_samples=1, n_instances=2,
                                           seed=0).get_batch([0])
        _stage_diffs(args.torch_checkpoint, state, cfg, batch)

    if not args.dataroot:
        print('\nNo --dataroot given: skipping the metric table '
              '(nuScenes data required for IoU/VPQ).')
        return

    from evaluate import eval_checkpoint
    results = eval_checkpoint('', args.dataroot, args.version, args.max_batches,
                              device_matching=args.device_matching,
                              state_cfg=(state, cfg))
    print('\nParity vs reference published metrics '
          '(/root/reference/README.md:62):')
    print(f'{"metric":>14} {"ours":>8} {"published":>10} {"delta":>8}')
    for key in ['iou_30x30', 'iou_100x100', 'pq_30x30', 'pq_100x100',
                'sq_100x100', 'rq_100x100']:
        if key not in results:
            continue
        ours = 100.0 * float(results[key])
        pub = PUBLISHED.get(key)
        pub_s = f'{pub:10.1f}' if pub is not None else f'{"—":>10}'
        delta = f'{ours - pub:+8.2f}' if pub is not None else f'{"":>8}'
        print(f'{key:>14} {ours:8.2f} {pub_s} {delta}')


if __name__ == '__main__':
    main()
