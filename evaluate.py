"""Evaluation entry point: IoU + temporally-consistent VPQ at two BEV crops.

Usage parity with the reference (/root/reference/evaluate.py):
    python evaluate.py --checkpoint <ckpt_dir> [--dataroot D] [--version V]

Protocol (evaluate.py:12-15,28-29,56-59): batch 1, zero-noise mean prediction,
metrics computed at 30x30 m ([70:130]) and 100x100 m ([0:200]) crops of the
200x200 BEV grid.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from fiery_tpu.data.dataset import numeric_batch, prepare_dataloaders
from fiery_tpu.postprocess.instance import (
    decode_instance_predictions,
    make_instance_id_temporally_consistent_device,
    predict_instance_segmentation_and_trajectories,
)
from fiery_tpu.training.metrics import IntersectionOverUnion, PanopticMetric
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.utils.checkpoint import load_checkpoint

EVALUATION_RANGES = {'30x30': (70, 130), '100x100': (0, 200)}


@jax.jit
def _device_consistent(output):
    """Fully-on-device postprocessing: decode + optimal-assignment temporal ID
    matching (ops/lap.py Jonker-Volgenant, vmapped over the batch) — the same
    assignment problem as the host scipy Hungarian path, optimal up to f32
    tie-breaking (--device-matching)."""
    pred_inst = decode_instance_predictions(
        {k: output[k] for k in ['segmentation', 'instance_center', 'instance_offset']})
    flow = output['instance_flow']
    if flow is None:
        flow = jnp.zeros_like(output['instance_offset'])
    return jax.vmap(make_instance_id_temporally_consistent_device)(pred_inst, flow)


def eval_checkpoint(checkpoint_path, dataroot=None, version=None, max_batches=None,
                    device_matching=False, state_cfg=None):
    if state_cfg is not None:
        state, cfg = state_cfg
    elif checkpoint_path.endswith(('.ckpt', '.pth', '.pt')):
        # a reference torch checkpoint (e.g. the released fiery.ckpt): rebuild the
        # cfg from its hyper_parameters and import every mapped weight
        from fiery_tpu.utils.checkpoint import load_torch_full_checkpoint
        state, cfg = load_torch_full_checkpoint(checkpoint_path)
    else:
        state, cfg = load_checkpoint(checkpoint_path)
    cfg.defrost()
    cfg.BATCHSIZE = 1
    if dataroot is not None:
        cfg.DATASET.DATAROOT = dataroot
    if version is not None:
        cfg.DATASET.VERSION = version
    cfg.freeze()

    trainer = Trainer(cfg)
    _, valloader = prepare_dataloaders(cfg)

    n_classes = trainer.model_cfg.n_classes
    ranges = _scaled_ranges(trainer.model_cfg.bev_size)
    panoptic_metrics = {key: PanopticMetric(n_classes) for key in ranges}
    iou_metrics = {key: IntersectionOverUnion(n_classes) for key in ranges}

    eval_step = jax.jit(trainer.eval_step)
    for i, batch_np in enumerate(valloader):
        if max_batches is not None and i >= max_batches:
            break
        batch = {k: jnp.asarray(v) for k, v in numeric_batch(batch_np).items()}
        output, labels, _ = eval_step(state, batch)

        seg_pred = np.asarray(jnp.argmax(output['segmentation'], axis=-1).astype(jnp.uint8))
        seg_label = np.asarray(labels['segmentation'].astype(jnp.uint8))
        if device_matching:
            consistent = np.asarray(_device_consistent(output).astype(jnp.int16))
        else:
            consistent = predict_instance_segmentation_and_trajectories(output)
        inst_label = np.asarray(labels['instance'].astype(jnp.int16))

        for key, (start, end) in ranges.items():
            iou_metrics[key].update(seg_pred[..., start:end, start:end],
                                    seg_label[..., start:end, start:end])
            panoptic_metrics[key].update(consistent[..., start:end, start:end],
                                         inst_label[..., start:end, start:end])

    results = {}
    for key in ranges:
        panoptic = panoptic_metrics[key].compute()
        iou = iou_metrics[key].compute()
        results[f'iou_{key}'] = iou[1]  # dynamic class
        for metric_key, value in panoptic.items():
            if metric_key != 'denominator':
                results[f'{metric_key}_{key}'] = value[1]
    return results


def _scaled_ranges(bev_size):
    """Scale the reference's 200-grid crop windows to the configured grid."""
    X, _ = bev_size
    out = {}
    for key, (start, end) in EVALUATION_RANGES.items():
        out[key] = (int(start * X / 200), int(end * X / 200))
    return out


def main():
    parser = argparse.ArgumentParser(description='fiery_tpu evaluation')
    parser.add_argument('--checkpoint', default='', type=str,
                        help='orbax checkpoint dir, or a reference torch '
                             '.ckpt/.pth (e.g. the released fiery.ckpt)')
    parser.add_argument('--torch-checkpoint', default='', type=str,
                        help='explicit alias for a reference torch checkpoint')
    parser.add_argument('--dataroot', default=None, type=str)
    parser.add_argument('--version', default=None, type=str)
    parser.add_argument('--max-batches', default=None, type=int)
    parser.add_argument('--device-matching', action='store_true',
                        help='use the jittable Jonker-Volgenant ID matcher '
                             'instead of the host scipy Hungarian (keeps the whole '
                             'eval path on device; same optimal assignment)')
    args = parser.parse_args()
    checkpoint = args.torch_checkpoint or args.checkpoint
    if not checkpoint:
        parser.error('--checkpoint (or --torch-checkpoint) is required')

    results = eval_checkpoint(checkpoint, args.dataroot, args.version,
                              args.max_batches, device_matching=args.device_matching)
    for panoptic_key in ['iou', 'pq', 'sq', 'rq']:
        print(panoptic_key)
        print('    '.join([f'{k}: {v:.4f}' for k, v in results.items()
                           if k.startswith(panoptic_key)]))


if __name__ == '__main__':
    main()
