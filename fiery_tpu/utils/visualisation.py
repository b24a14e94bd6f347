"""Visualisation utilities: flow colour wheel, heatmaps, instance maps, video panels.

Reference: /root/reference/fiery/utils/visualisation.py. Differences: tensors are
channels-last numpy; the instance palette is generated programmatically (HSV walk with
large golden-ratio hue steps) instead of a hardcoded colour table; video panels are
returned as (B, T, H, W, 3) uint8.
"""

import colorsys

import matplotlib
import matplotlib.pylab
import numpy as np

DEFAULT_COLORMAP = matplotlib.pylab.cm.jet


def _make_colorwheel():
    """Baker et al. (ICCV 2007) optical-flow colour wheel: 55 hues interpolated
    along the 6 primary-colour transitions R->Y->G->C->B->M->R with the standard
    per-segment lengths. Built here by vectorised interpolation between the anchor
    colours (each segment changes exactly one RGB channel, quantised like the
    original Middlebury flow code: floor(255*i/len)/255 steps)."""
    seg_lens = np.array([15, 6, 4, 11, 13, 6])
    anchors = np.array([[255, 0, 0], [255, 255, 0], [0, 255, 0], [0, 255, 255],
                        [0, 0, 255], [255, 0, 255], [255, 0, 0]], dtype=np.float64)
    seg_id = np.repeat(np.arange(len(seg_lens)), seg_lens)
    seg_start = np.repeat(np.cumsum(seg_lens) - seg_lens, seg_lens)
    pos = np.arange(seg_lens.sum()) - seg_start
    frac = np.floor(255 * pos / np.repeat(seg_lens, seg_lens)) / 255
    return anchors[seg_id] + frac[:, None] * (anchors[seg_id + 1] - anchors[seg_id])


_COLORWHEEL = _make_colorwheel()


def compute_color(u, v):
    """Map (u, v) flow components to RGB in [0, 1] via the colour wheel.

    Flow angle selects (bilinearly, with wraparound) a wheel hue; radius <= 1
    blends towards white, radius > 1 is dimmed to 75% (Middlebury convention)."""
    nan_mask = np.isnan(u) | np.isnan(v)
    u = np.where(nan_mask, 0.0, u)
    v = np.where(nan_mask, 0.0, v)

    ncols = _COLORWHEEL.shape[0]
    rad = np.sqrt(u * u + v * v)[..., None]
    pos = (np.arctan2(-v, -u) / np.pi + 1) / 2 * (ncols - 1)   # [0, ncols-1]
    k0 = np.floor(pos).astype(int)
    f = (pos - k0)[..., None]
    col = ((1 - f) * _COLORWHEEL[k0] + f * _COLORWHEEL[(k0 + 1) % ncols]) / 255
    col = np.where(rad <= 1, 1 - rad * (1 - col), 0.75 * col)
    return col * ~nan_mask[..., None]


def flow_to_image(flow, autoscale=False):
    """(h, w, 2) flow -> (h, w, 3) uint8 colour image."""
    u = np.array(flow[..., 0], dtype=np.float64)
    v = np.array(flow[..., 1], dtype=np.float64)
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = np.max(rad) if rad.size else 1.0
    if autoscale:
        u = u / (maxrad + np.finfo(float).eps)
        v = v / (maxrad + np.finfo(float).eps)
    return np.uint8(compute_color(u, v) * 255)


def _normalise(image):
    lower = np.min(image)
    delta = np.max(image) - lower
    if delta == 0:
        delta = 1
    return (image.astype(np.float32) - lower) / delta


def heatmap_image(image, cmap=DEFAULT_COLORMAP, autoscale=True):
    """(h, w) float -> (h, w, 3) uint8 colourised heatmap."""
    if autoscale:
        image = _normalise(image)
    return np.uint8(cmap(image)[..., :3] * 255)


def make_contour(img, colour=(0, 0, 0), double_line=False):
    """Draw a 1 (or 2) pixel frame around an (h, w, 3) image."""
    out = img.copy()
    out[0, :] = colour
    out[-1, :] = colour
    out[:, 0] = colour
    out[:, -1] = colour
    if double_line:
        out[1, :] = colour
        out[-2, :] = colour
        out[:, 1] = colour
        out[:, -2] = colour
    return out


def generate_instance_colours(instance_map):
    """Distinct colours per instance id: golden-ratio hue walk in HSV."""
    colours = {}
    for instance_id, global_id in instance_map.items():
        if global_id == 0:
            colours[instance_id] = np.array([0, 0, 0], dtype=np.uint8)
            continue
        hue = (global_id * 0.61803398875) % 1.0
        sat = 0.65 + 0.35 * ((global_id * 7) % 3) / 2.0
        val = 0.75 + 0.25 * ((global_id * 5) % 2)
        rgb = colorsys.hsv_to_rgb(hue, sat, val)
        colours[instance_id] = np.uint8(np.asarray(rgb) * 255)
    return colours


def plot_instance_map(instance_image, instance_map, instance_colours=None,
                      bg_image=None):
    """(h, w) int instance ids -> (h, w, 3) uint8 image (white background)."""
    instance_image = np.asarray(instance_image)
    if instance_colours is None:
        instance_colours = generate_instance_colours(instance_map)
    if bg_image is None:
        plot_image = 255 * np.ones((*instance_image.shape, 3), dtype=np.uint8)
    else:
        plot_image = bg_image.copy()
    for key, value in instance_colours.items():
        plot_image[instance_image == key] = value
    return plot_image


def visualise_output(labels, output, cfg):
    """GT-vs-prediction 5-row panel video: (1, T, H_total, W_total, 3) uint8.

    Rows: instances, future flow, semantic seg, centerness, offset; columns GT | pred.
    Reference: visualisation.py:205-282.
    """
    from fiery_tpu.postprocess.instance import (
        predict_instance_segmentation_and_trajectories)

    semantic_colours = np.array([[255, 255, 255], [0, 0, 0]], dtype=np.uint8)
    consistent_instance_seg = predict_instance_segmentation_and_trajectories(
        output, compute_matched_centers=False)

    sequence_length = consistent_instance_seg.shape[1]
    b = 0
    video = []

    def panel(instance_t, seg_t, flow_t, center_t, offset_t):
        unique_ids = np.unique(instance_t)[1:]
        instance_map = dict(zip(unique_ids, unique_ids))
        instance_plot = make_contour(
            plot_instance_map(instance_t, instance_map)[::-1, ::-1])
        semantic_plot = make_contour(semantic_colours[seg_t[::-1, ::-1]])
        if flow_t is not None:
            flow_masked = np.where((seg_t == 1)[..., None], flow_t, 0.0)
            flow_plot = make_contour(flow_to_image(flow_masked)[::-1, ::-1])
        else:
            flow_plot = np.zeros_like(semantic_plot)
        center_plot = make_contour(heatmap_image(center_t)[::-1, ::-1])
        offset_masked = np.where((seg_t == 1)[..., None], offset_t, 0.0)
        offset_plot = make_contour(flow_to_image(offset_masked)[::-1, ::-1])
        return np.concatenate(
            [instance_plot, flow_plot, semantic_plot, center_plot, offset_plot], axis=0)

    seg_label = np.asarray(labels['segmentation'])
    seg_pred = np.argmax(np.asarray(output['segmentation']), axis=-1)
    flow_enabled = cfg.INSTANCE_FLOW.ENABLED

    for t in range(sequence_length):
        gt = panel(
            np.asarray(labels['instance'][b, t]),
            seg_label[b, t],
            np.asarray(labels['flow'][b, t]) if flow_enabled else None,
            np.asarray(labels['centerness'][b, t, :, :, 0]),
            np.asarray(labels['offset'][b, t]))
        pred = panel(
            consistent_instance_seg[b, t],
            seg_pred[b, t],
            np.asarray(output['instance_flow'][b, t]) if flow_enabled else None,
            np.asarray(output['instance_center'][b, t, :, :, 0]),
            np.asarray(output['instance_offset'][b, t]))
        video.append(np.concatenate([gt, pred], axis=1))

    return np.stack(video)[None]  # (1, T, H, W, 3)


def convert_figure_numpy(figure):
    """Matplotlib figure -> (h, w, 3) uint8 numpy image."""
    figure.canvas.draw()
    buf = np.asarray(figure.canvas.buffer_rgba())
    return buf[..., :3].copy()
