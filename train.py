"""Training entry point.

Usage parity with the reference (/root/reference/train.py, README.md:74-77):
    python train.py --config fiery_tpu/configs/baseline.yml [KEY VALUE ...]

The reference delegates distribution to Lightning DDP over cfg.GPUS with per-device
batch cfg.BATCHSIZE (train.py:33-45). Here the same recipe is a data-parallel mesh:
global batch = BATCHSIZE * n_shards, jit-sharded over the devices; sync-BN and the
gradient all-reduce are emitted by XLA.
"""

import os
import socket
import time

import jax
import jax.numpy as jnp
import numpy as np

from fiery_tpu.data.dataset import numeric_batch, prepare_dataloaders
from fiery_tpu.parallel.mesh import (create_mesh, make_parallel_train_step,
                                     maybe_initialize_distributed, shard_batch)
from fiery_tpu.training.metrics import IntersectionOverUnion, PanopticMetric
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.utils.checkpoint import (load_pretrained_params, save_checkpoint,
                                        save_checkpoint_async, wait_for_async_save)
from fiery_tpu.utils.config import apply_platform_arg, get_cfg, get_parser


class MetricLogger:
    """TensorBoard if available, always a JSONL mirror."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl = open(os.path.join(log_dir, 'metrics.jsonl'), 'a')
        try:
            from flax.metrics import tensorboard
            self.tb = tensorboard.SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def scalar(self, key, value, step):
        import json
        self.jsonl.write(json.dumps({'step': int(step), key: float(value)}) + '\n')
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.scalar(key, float(value), step)

    def video(self, key, frames, step):
        """frames: (1, T, H, W, 3) uint8 GT-vs-pred panel (reference trainer.py:193-198
        logs a TB video). Written as an animated GIF on disk AND as an animated-GIF
        TB image summary (renders as a looping video in the TensorBoard images tab —
        the same encoding tensorboardX's add_video produces, built with PIL since
        moviepy is absent); falls back to per-frame TB images."""
        import io
        import numpy as _np
        frames = _np.asarray(frames)
        gif_bytes = None
        try:
            from PIL import Image
            vid_dir = os.path.join(self.log_dir, 'videos')
            os.makedirs(vid_dir, exist_ok=True)
            imgs = [Image.fromarray(frames[0, t]) for t in range(frames.shape[1])]
            imgs[0].save(os.path.join(vid_dir, f'{key}_step{step}.gif'),
                         save_all=True, append_images=imgs[1:], duration=500, loop=0)
            buf = io.BytesIO()
            imgs[0].save(buf, format='GIF', save_all=True, append_images=imgs[1:],
                         duration=500, loop=0)
            gif_bytes = buf.getvalue()
        except Exception:
            pass
        if gif_bytes is not None:
            try:
                from tensorboardX import SummaryWriter
                from tensorboardX.proto.summary_pb2 import Summary
                if not hasattr(self, '_tbx'):
                    self._tbx = SummaryWriter(self.log_dir)
                img = Summary.Image(encoded_image_string=gif_bytes,
                                    height=int(frames.shape[2]),
                                    width=int(frames.shape[3]))
                self._tbx.file_writer.add_summary(
                    Summary(value=[Summary.Value(tag=key, image=img)]), step)
                self._tbx.flush()
                return
            except Exception:
                pass
        if self.tb is None:
            return
        for t in range(frames.shape[1]):
            self.tb.image(f'{key}/t{t}', frames[0, t], step)


def main():
    parser = get_parser()
    parser.add_argument('--resume', default='', type=str,
                        help='resume training from: a checkpoint dir, a run dir '
                             '(latest checkpoint_epochN picked automatically), '
                             "or the literal 'auto' (newest complete checkpoint "
                             'under cfg.LOG_DIR — preemption recovery)')
    parser.add_argument('--profile-dir', default='', type=str,
                        help='start a jax.profiler trace into this directory')
    parser.add_argument('--camera-parallel', default=1, type=int,
                        help='shard the camera axis over this many devices per '
                             'data shard (2-D (data, model) mesh); cuts per-chip '
                             'encoder activation memory n-fold')
    parser.add_argument('--bev-parallel', action='store_true',
                        help='additionally spatially partition the post-splat BEV '
                             'pipeline (temporal/GRU/decoder) over the model axis '
                             '(requires --camera-parallel > 1); XLA inserts conv '
                             'halo exchanges on ICI, per-chip BEV activation '
                             'memory drops n_model-fold')
    args = parser.parse_args()
    apply_platform_arg(args)
    cfg = get_cfg(args)

    maybe_initialize_distributed()
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    n_devices = len(jax.devices())
    process_count = jax.process_count()
    n_model = max(1, args.camera_parallel)
    if process_count > 1:
        n_shards = n_devices  # pod runs span every device
    else:
        n_shards = min(n_devices, max(1, len(cfg.GPUS)) * n_model)
    if n_shards % n_model:
        raise SystemExit(f'--camera-parallel {n_model} must divide the '
                         f'{n_shards} devices used')
    if args.bev_parallel and n_model <= 1:
        raise SystemExit('--bev-parallel requires --camera-parallel > 1 '
                         '(the model axis it shards over)')
    # cfg.BATCHSIZE is per-chip (like the reference's per-GPU BATCHSIZE,
    # configs/baseline.yml:5) and is what gets checkpointed; the loaders see the
    # per-host batch, and shard_batch assembles the global array across hosts.
    # Under camera parallelism a "data shard" spans n_model devices.
    global_batch = cfg.BATCHSIZE * (n_shards // n_model)
    per_host_batch = global_batch // process_count

    trainloader, valloader = prepare_dataloaders(
        cfg, batch_size=per_host_batch,
        process_index=jax.process_index(), process_count=process_count)

    depth_keep = None
    if cfg.LIFT.DEPTH_CULL:
        # peek one batch for the calibration envelope, then statically cull
        # provably-out-of-bounds far depth planes from the splat
        from fiery_tpu.ops.lift_splat import (compute_depth_plane_keep,
                                              create_frustum)
        from fiery_tpu.utils.geometry import calculate_birds_eye_view_parameters
        peek = None
        for batch_np in trainloader:
            peek = numeric_batch(batch_np)
            break
        assert peek is not None, 'empty training dataset'
        frustum = create_frustum(cfg.IMAGE.FINAL_DIM,
                                 cfg.MODEL.ENCODER.DOWNSAMPLE, cfg.LIFT.D_BOUND)
        res, start, dim = calculate_birds_eye_view_parameters(
            cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
        depth_keep = compute_depth_plane_keep(
            frustum, peek['intrinsics'], peek['extrinsics'],
            np.asarray(res), np.asarray(start), np.asarray(dim),
            t_margin=cfg.LIFT.CULL_T_MARGIN,
            rot_margin_deg=cfg.LIFT.CULL_ROT_MARGIN)
        D = frustum.shape[0]
        print(f'depth-plane cull: keep {[int(k) for k in depth_keep]} of {D} '
              f'planes/camera '
              f'({100 * (1 - depth_keep.sum() / (D * len(depth_keep))):.0f}% of '
              f'splat rows culled)')

    trainer = Trainer(cfg, depth_keep=depth_keep)

    save_dir = os.path.join(
        cfg.LOG_DIR, time.strftime('%d%B%Y_%H%M') + '_' + socket.gethostname()
        + '_' + cfg.TAG)
    logger = MetricLogger(save_dir)
    print(f'Logging to {save_dir}; devices={n_devices}, shards={n_shards}, '
          f'global batch={global_batch}')

    mesh = create_mesh(n_shards, n_model=n_model)
    first_batch = None
    for batch_np in trainloader:
        first_batch = {k: jnp.asarray(v) for k, v in numeric_batch(batch_np).items()}
        break
    assert first_batch is not None, 'empty training dataset'

    state = jax.jit(trainer.init_state)(jax.random.key(0), first_batch)
    start_epoch = 0
    if args.resume:
        from fiery_tpu.utils.checkpoint import (find_latest_checkpoint,
                                                load_checkpoint)
        target = cfg.LOG_DIR if args.resume == 'auto' else args.resume
        resolved = find_latest_checkpoint(target)
        if resolved is None:
            if args.resume == 'auto':
                # cold start: nothing saved yet — begin training from scratch
                print(f'--resume auto: no checkpoint under {target}, '
                      'starting fresh')
            else:
                raise SystemExit(f'--resume: no complete checkpoint at {target}')
        else:
            print(f'Resuming from {resolved}')
            # state_template casts opt_state back onto the optax NamedTuple
            # structure (orbax restores raw dicts, which train_step can't use)
            state, _ = load_checkpoint(resolved, state_template=state)
            start_epoch = int(np.asarray(state.step)) // max(1, len(trainloader))
    elif cfg.PRETRAINED.LOAD_WEIGHTS and cfg.PRETRAINED.PATH:
        # orbax dir, torch FIERY ckpt, or standalone ImageNet EfficientNet .pth
        # (the reference's default init, encoder.py:16)
        print(f'Warm-starting from {cfg.PRETRAINED.PATH}')
        state = load_pretrained_params(cfg.PRETRAINED.PATH, state,
                                       model_cfg=trainer.model_cfg)

    train_step = make_parallel_train_step(trainer, mesh, donate_state=True,
                                          bev_parallel=args.bev_parallel)
    eval_step = jax.jit(trainer.eval_step)
    rng = jax.random.key(42)

    global_step = int(np.asarray(state.step))
    for epoch in range(start_epoch, cfg.EPOCHS):
        epoch_start = time.time()
        for batch_np in trainloader:
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in numeric_batch(batch_np).items()}, mesh)
            state, metrics = train_step(state, batch, rng)
            global_step += 1
            if global_step % cfg.LOGGING_INTERVAL == 0 or global_step == 1:
                total = float(metrics['total_loss'])
                print(f'epoch {epoch} step {global_step}: loss={total:.4f}')
                for k, v in metrics.items():
                    logger.scalar(k, float(v), global_step)
            if global_step % cfg.VIS_INTERVAL == 0:
                # GT-vs-pred panel video (reference trainer.py:206-207)
                from fiery_tpu.utils.visualisation import visualise_output
                output, labels, _ = eval_step(state, batch)
                logger.video('train_outputs', visualise_output(labels, output, cfg),
                             global_step)

        # validation: IoU accumulated ON DEVICE (iou_update_jnp; one host pull per
        # epoch instead of per-batch frame pulls), VPQ from compressed int16 ids
        iou_metric = IntersectionOverUnion(trainer.model_cfg.n_classes)
        panoptic_metric = PanopticMetric(trainer.model_cfg.n_classes)
        from fiery_tpu.postprocess.instance import (
            predict_instance_segmentation_and_trajectories)
        from fiery_tpu.training.metrics import iou_update_jnp

        n_classes = trainer.model_cfg.n_classes

        @jax.jit
        def val_step(state, batch, iou_state):
            output, labels, _ = trainer.eval_step(state, batch)
            seg_pred = jnp.argmax(output['segmentation'], axis=-1)
            iou_state = iou_state + iou_update_jnp(
                seg_pred, labels['segmentation'], n_classes)
            return output, labels, iou_state

        iou_state = jnp.zeros((4, n_classes), jnp.float32)
        for val_i, batch_np in enumerate(valloader):
            batch = {k: jnp.asarray(v) for k, v in numeric_batch(batch_np).items()}
            output, labels, iou_state = val_step(state, batch, iou_state)
            if val_i == 0:
                # val-batch-0 GT-vs-pred video (reference trainer.py:206-216)
                from fiery_tpu.utils.visualisation import visualise_output
                logger.video('val_outputs', visualise_output(labels, output, cfg),
                             global_step)
            consistent = predict_instance_segmentation_and_trajectories(output)
            panoptic_metric.update(consistent,
                                   np.asarray(labels['instance'].astype(jnp.int16)))
        iou_metric.load_state(np.asarray(iou_state).astype(np.float64))
        # uncertainty-weight logging (reference trainer.py:236-246)
        uw = jax.device_get(state.params['uncertainty'])
        logger.scalar('segmentation_weight', 1.0 / np.exp(uw['segmentation_weight']),
                      global_step)
        logger.scalar('centerness_weight', 1.0 / (2 * np.exp(uw['centerness_weight'])),
                      global_step)
        logger.scalar('offset_weight', 1.0 / (2 * np.exp(uw['offset_weight'])),
                      global_step)
        if 'flow_weight' in uw:
            logger.scalar('flow_weight', 1.0 / (2 * np.exp(uw['flow_weight'])),
                          global_step)
        if process_count > 1:
            # distributed metric reduction (reference metrics.py:26-29
            # dist_reduce_fx='sum'): sum the per-host states before compute
            from jax.experimental import multihost_utils
            for metric in (iou_metric, panoptic_metric):
                metric.load_state(np.asarray(multihost_utils.process_allgather(
                    metric.state())).sum(axis=0))
        iou_scores = iou_metric.compute()
        panoptic_scores = panoptic_metric.compute()
        for name, score in zip(['background', 'dynamic'], iou_scores):
            logger.scalar(f'val_iou_{name}', score, global_step)
        logger.scalar('val_vpq_vehicles', panoptic_scores['pq'][1], global_step)
        print(f'epoch {epoch} done in {time.time() - epoch_start:.1f}s: '
              f'val IoU={list(np.round(iou_scores, 4))} '
              f'VPQ={panoptic_scores["pq"][1]:.4f}')

        save_checkpoint_async(os.path.join(save_dir, f'checkpoint_epoch{epoch}'),
                              state, cfg)

    wait_for_async_save()
    save_checkpoint(os.path.join(save_dir, 'checkpoint_final'), state, cfg)
    if args.profile_dir:
        jax.profiler.stop_trace()
    print(f'Training complete; checkpoints in {save_dir}')


if __name__ == '__main__':
    main()
