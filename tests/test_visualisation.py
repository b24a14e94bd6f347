"""Visualisation utility tests (numpy-level)."""

import numpy as np
import jax.numpy as jnp

from fiery_tpu.utils import visualisation as V


def test_flow_to_image_shapes_and_range():
    rng = np.random.RandomState(0)
    flow = rng.randn(16, 16, 2).astype(np.float32)
    img = V.flow_to_image(flow)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8
    # zero flow maps to (near-)white center of the colour wheel
    white = V.flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert (white > 240).all()


def test_heatmap_image():
    hm = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    img = V.heatmap_image(hm)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8


def test_instance_colours_distinct_and_deterministic():
    cmap = {i: i for i in range(1, 30)}
    colours = V.generate_instance_colours(cmap)
    tuples = {tuple(v) for v in colours.values()}
    assert len(tuples) == 29  # all distinct
    colours2 = V.generate_instance_colours(cmap)
    for k in cmap:
        assert (colours[k] == colours2[k]).all()


def test_plot_instance_map_and_contour():
    seg = np.zeros((10, 10), np.int32)
    seg[2:5, 2:5] = 1
    img = V.plot_instance_map(seg, {1: 1})
    assert img.shape == (10, 10, 3)
    assert (img[0, 0] == 255).all()          # background white
    assert not (img[3, 3] == 255).all()      # instance coloured
    framed = V.make_contour(img)
    assert (framed[0, :] == 0).all() and (framed[:, -1] == 0).all()


def test_plot_prediction_panel_layout():
    """visualise.py's figure: 2x4 GridSpec, annotated cameras, BEV right column.

    Mirrors the reference panel (/root/reference/visualise.py:45-77); checks the
    figure renders at the reference aspect (4*val_w x 2*val_w*ratio at 100 dpi).
    """
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import visualise as vis_entry
    from fiery_tpu.utils.config import get_cfg

    cfg = get_cfg(cfg_dict={'INSTANCE_FLOW': {'ENABLED': True}})
    rng = np.random.RandomState(0)
    b, s, n, h, w = 1, 3, 6, 16, 16
    ih, iw = 32, 64
    image = rng.randint(0, 255, (b, s, n, ih, iw, 3)).astype(np.uint8)
    output = {
        'segmentation': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_center': jnp.asarray(rng.rand(b, s, h, w, 1).astype(np.float32)),
        'instance_offset': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_flow': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
    }
    fig_np = vis_entry.plot_prediction(image, output, cfg)
    assert fig_np.dtype == np.uint8 and fig_np.ndim == 3 and fig_np.shape[-1] == 3
    val_w = 2.99
    ratio = cfg.IMAGE.FINAL_DIM[0] / cfg.IMAGE.FINAL_DIM[1]
    assert fig_np.shape[1] == int(4 * val_w * 100)
    assert fig_np.shape[0] == int(round(2 * val_w * ratio * 100))


def test_visualise_output_panel():
    from fiery_tpu.utils.config import get_cfg
    cfg = get_cfg(cfg_dict={'INSTANCE_FLOW': {'ENABLED': True}})
    h = w = 16
    b, s = 1, 2
    rng = np.random.RandomState(0)
    labels = {
        'instance': jnp.asarray(rng.randint(0, 3, (b, s, h, w))),
        'segmentation': jnp.asarray(rng.randint(0, 2, (b, s, h, w))),
        'flow': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'centerness': jnp.asarray(rng.rand(b, s, h, w, 1).astype(np.float32)),
        'offset': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
    }
    output = {
        'segmentation': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_center': jnp.asarray(rng.rand(b, s, h, w, 1).astype(np.float32)),
        'instance_offset': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
        'instance_flow': jnp.asarray(rng.randn(b, s, h, w, 2).astype(np.float32)),
    }
    video = V.visualise_output(labels, output, cfg)
    # 5 rows of panels stacked vertically, GT | pred side by side
    assert video.shape == (1, s, 5 * h, 2 * w, 3)
    assert video.dtype == np.uint8
