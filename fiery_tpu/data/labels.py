"""Instance-label generation: centerness / offset / future-flow maps from instance ids.

Host-side numpy port of the reference generator
(/root/reference/fiery/utils/instance.py:12-77): per instance per frame, compute the
mass center, accumulate a Gaussian centerness heatmap (sigma=3, max-combined), write
pixelwise offsets-to-center, and write the ego-compensated future displacement of the
center at frame t into the t-1 slice over the instance's t-1 mask.
"""

import numpy as np
import jax.numpy as jnp

from fiery_tpu.ops.warp import warp_features
from fiery_tpu.utils.geometry import invert_pose_matrix, mat2pose_vec, pose_vec2mat


def convert_instance_mask_to_center_and_offset_label(
        instance_img, future_egomotion, num_instances, ignore_index=255,
        subtract_egomotion=True, sigma=3.0, spatial_extent=None):
    """instance_img: (seq_len, h, w) int; future_egomotion: (seq_len, 6).

    Returns (center (s, h, w, 1), offset (s, h, w, 2), future_flow (s, h, w, 2)),
    channels-last. Offset/flow channel 0 is the vertical (h/x) displacement,
    channel 1 horizontal (w/y), matching the reference.
    """
    instance_img = np.asarray(instance_img)
    seq_len, h, w = instance_img.shape
    center_label = np.zeros((seq_len, h, w, 1), dtype=np.float32)
    offset_label = np.full((seq_len, h, w, 2), ignore_index, dtype=np.float32)
    future_displacement_label = np.full((seq_len, h, w, 2), ignore_index, dtype=np.float32)

    x, y = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing='ij')

    if subtract_egomotion:
        ego_inv = np.asarray(mat2pose_vec(invert_pose_matrix(
            pose_vec2mat(jnp.asarray(future_egomotion)))))

    # warped instance segmentation for frames 1..seq_len-1
    warped_instance_seg = {}
    for t in range(1, seq_len):
        warped = warp_features(
            jnp.asarray(instance_img[t], dtype=jnp.float32)[None, :, :, None],
            jnp.asarray(ego_inv[t - 1])[None] if subtract_egomotion
            else jnp.zeros((1, 6)),
            mode='nearest', spatial_extent=spatial_extent)
        warped_instance_seg[t] = np.asarray(warped)[0, :, :, 0]

    for instance_id in range(1, num_instances + 1):
        prev_xc = prev_yc = prev_mask = None
        for t in range(seq_len):
            instance_mask = instance_img[t] == instance_id
            if instance_mask.sum() == 0:
                prev_xc = prev_yc = prev_mask = None
                continue

            xc = np.round(x[instance_mask].mean())
            yc = np.round(y[instance_mask].mean())

            off_x = xc - x
            off_y = yc - y
            g = np.exp(-(off_x ** 2 + off_y ** 2) / sigma ** 2)
            center_label[t, :, :, 0] = np.maximum(center_label[t, :, :, 0], g)
            offset_label[t, :, :, 0][instance_mask] = off_x[instance_mask]
            offset_label[t, :, :, 1][instance_mask] = off_y[instance_mask]

            if prev_xc is not None:
                warped_instance_mask = warped_instance_seg[t] == instance_id
                if warped_instance_mask.sum() > 0:
                    warped_xc = np.round(x[warped_instance_mask].mean())
                    warped_yc = np.round(y[warped_instance_mask].mean())
                    future_displacement_label[t - 1, :, :, 0][prev_mask] = warped_xc - prev_xc
                    future_displacement_label[t - 1, :, :, 1][prev_mask] = warped_yc - prev_yc

            prev_xc, prev_yc, prev_mask = xc, yc, instance_mask

    return center_label, offset_label, future_displacement_label
