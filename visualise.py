"""Visualisation entry point: render BEV future-instance predictions to PNG.

Usage parity with the reference (/root/reference/visualise.py):
    python visualise.py --checkpoint <ckpt_dir> [--data <dir-of-npz>]

The reference downloads 4 example .npz clips from a GitHub release
(visualise.py:80-98); offline, --data accepts a directory of equivalent .npz files
(keys: image, intrinsics, extrinsics, future_egomotion) and otherwise the synthetic
dataset provides example clips. Renders a camera grid + BEV instance/trajectory panel
into ./output_vis/.
"""

import argparse
from fiery_tpu.utils.config import add_platform_arg, apply_platform_arg
import glob
import os

import cv2
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp

from fiery_tpu.postprocess.instance import predict_instance_segmentation_and_trajectories
from fiery_tpu.training.trainer import Trainer
from fiery_tpu.utils.checkpoint import load_checkpoint
from fiery_tpu.utils.visualisation import (
    convert_figure_numpy,
    generate_instance_colours,
    make_contour,
    plot_instance_map,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])


def plot_prediction(image, output, cfg):
    """6-camera grid + BEV instance map with matched-center trajectories.

    Mirrors the reference figure layout (visualise.py:21-77).
    """
    consistent_instance_seg, matched_centers = \
        predict_instance_segmentation_and_trajectories(output, compute_matched_centers=True)

    # BEV panel: present-frame instances + trajectories
    unique_ids = np.unique(consistent_instance_seg[0, 0])[1:]
    instance_map = dict(zip(unique_ids, unique_ids))
    instance_colours = generate_instance_colours(instance_map)
    vis_image = plot_instance_map(consistent_instance_seg[0, 0], instance_map)

    trajectory_img = np.zeros(vis_image.shape, dtype=np.uint8)
    for instance_id in unique_ids:
        path = matched_centers[instance_id]
        for t in range(len(path) - 1):
            color = instance_colours[instance_id].tolist()
            cv2.line(trajectory_img, tuple(map(int, path[t])),
                     tuple(map(int, path[t + 1])), color, 4)

    temp_img = cv2.addWeighted(vis_image, 0.7, trajectory_img, 0.3, 1.0) \
        if trajectory_img.any() else vis_image
    mask = ~np.all(trajectory_img == 0, axis=2)
    vis_image[mask] = temp_img[mask]

    # Camera grid, reference layout (visualise.py:45-72): a 2x4 GridSpec with
    # cameras 0-2 on the top row, 3-5 mirrored on the bottom row, and the BEV
    # panel spanning the right column; per-camera name annotations.
    val_w = 2.99
    cameras = list(getattr(cfg.IMAGE, 'NAMES', []))
    image_ratio = cfg.IMAGE.FINAL_DIM[0] / cfg.IMAGE.FINAL_DIM[1]
    val_h = val_w * image_ratio
    fig = plt.figure(figsize=(4 * val_w, 2 * val_h))
    gs = matplotlib.gridspec.GridSpec(2, 4, width_ratios=(val_w,) * 4)
    gs.update(wspace=0.0, hspace=0.0, left=0.0, right=1.0, top=1.0, bottom=0.0)

    n_cams = image.shape[2]
    present = min(cfg.TIME_RECEPTIVE_FIELD, image.shape[1]) - 1
    for i in range(min(6, n_cams)):
        ax = fig.add_subplot(gs[i // 3, i % 3])
        img = np.asarray(image[0, present, i])
        if img.dtype == np.uint8:      # loaders now ship RAW uint8 frames
            img = img.astype(np.float64) / 255.0
        else:                          # normalised f32 (e.g. offline npz clips)
            img = np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0, 1)
        if i >= 3:
            img = img[:, ::-1]
        if i < len(cameras):
            ax.annotate(cameras[i].replace('_', ' ').replace('CAM ', ''),
                        (0.01, 0.87), c='white', xycoords='axes fraction',
                        fontsize=14)
        ax.imshow(img)
        ax.axis('off')
    ax = fig.add_subplot(gs[:, 3])
    ax.imshow(make_contour(vis_image[::-1, ::-1]))
    ax.axis('off')
    out = convert_figure_numpy(fig)
    plt.close(fig)
    return out


def download_example_data(path):
    """The reference fetches example clips from a GitHub release (visualise.py:80-98);
    this environment has no egress, so we only use already-present files."""
    return sorted(glob.glob(os.path.join(path, '*.npz')))


def visualise(checkpoint_path, data_path):
    state, cfg = load_checkpoint(checkpoint_path)
    trainer = Trainer(cfg)
    import jax
    predict = jax.jit(trainer.predict_step)

    os.makedirs('./output_vis', exist_ok=True)
    example_files = download_example_data(data_path) if data_path else []

    if example_files:
        batches = []
        for f in example_files:
            d = np.load(f)
            batches.append({k: jnp.asarray(d[k]) for k in
                            ['image', 'intrinsics', 'extrinsics', 'future_egomotion']})
    else:
        print('No example npz found; using synthetic clips.')
        from fiery_tpu.data.synthetic import SyntheticFutureDataset
        ds = SyntheticFutureDataset(cfg, n_samples=4, seed=7)
        batches = [{k: jnp.asarray(v) for k, v in ds.get_batch([i]).items()}
                   for i in range(4)]

    for i, batch in enumerate(batches):
        output = predict(state, batch)
        figure_numpy = plot_prediction(batch['image'], output, cfg)
        output_filename = os.path.join('./output_vis', f'{i}.png')
        plt.imsave(output_filename, figure_numpy)
        print(f'Saved output in {output_filename}')


def main():
    parser = argparse.ArgumentParser(description='fiery_tpu visualisation')
    parser.add_argument('--checkpoint', required=True, type=str)
    parser.add_argument('--data', default='', type=str,
                        help='directory of example .npz clips')
    add_platform_arg(parser)
    args = parser.parse_args()
    apply_platform_arg(args)
    visualise(args.checkpoint, args.data)


if __name__ == '__main__':
    main()
