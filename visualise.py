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

    # camera grid (first frame of the receptive field end = present)
    fig = plt.figure(figsize=(13, 7))
    n_cams = image.shape[2]
    present = min(cfg.TIME_RECEPTIVE_FIELD, image.shape[1]) - 1
    for i in range(min(6, n_cams)):
        ax = fig.add_subplot(3, 3, i + 1 if i < 3 else i + 4)
        img = np.asarray(image[0, present, i])
        if img.dtype == np.uint8:      # loaders now ship RAW uint8 frames
            img = img.astype(np.float64) / 255.0
        else:                          # normalised f32 (e.g. offline npz clips)
            img = np.clip(img * IMAGENET_STD + IMAGENET_MEAN, 0, 1)
        if i >= 3:
            img = img[:, ::-1]
        ax.imshow(img)
        ax.axis('off')
    ax = fig.add_subplot(3, 3, (5, 6))
    ax.imshow(make_contour(vis_image[::-1, ::-1]))
    ax.axis('off')
    plt.subplots_adjust(wspace=0, hspace=0)
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
    args = parser.parse_args()
    visualise(args.checkpoint, args.data)


if __name__ == '__main__':
    main()
