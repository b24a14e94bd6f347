"""Every shipped config YAML must build a well-formed model graph.

Uses jax.eval_shape — pure tracing, no compilation or compute — so the full
reference config set (baseline, single_timeframe, literature/*, lyft/*) is
validated at its REAL shapes (224x480 x 6 cameras, 200x200 or 320x192 BEV):
channel arithmetic, encoder truncation, temporal receptive fields, head wiring.
Reference config set: /root/reference/fiery/configs/**.
"""

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiery_tpu.models.fiery import build_fiery
from fiery_tpu.utils.config import get_cfg

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), '..', 'fiery_tpu', 'configs')
CONFIGS = sorted(
    os.path.relpath(p, CONFIG_ROOT)
    for p in glob.glob(os.path.join(CONFIG_ROOT, '**', '*.yml'), recursive=True))


@pytest.mark.parametrize('rel', CONFIGS)
def test_config_builds_model_graph(rel):
    cfg = get_cfg(argparse.Namespace(
        config_file=os.path.join(CONFIG_ROOT, rel), opts=[]))
    model = build_fiery(cfg)

    b = 1
    s = cfg.TIME_RECEPTIVE_FIELD + cfg.N_FUTURE_FRAMES
    n = len(cfg.IMAGE.NAMES)
    H, W = cfg.IMAGE.FINAL_DIM
    image = jnp.zeros((b, s, n, H, W, 3), jnp.float32)
    intrinsics = jnp.zeros((b, s, n, 3, 3), jnp.float32)
    extrinsics = jnp.zeros((b, s, n, 4, 4), jnp.float32)
    ego = jnp.zeros((b, s, 6), jnp.float32)

    # eval-mode graph: the probabilistic future path samples the present mean with
    # zero noise, so no future-label conditioning input is required (train-mode
    # graphs are covered end-to-end for the baseline family in test_trainer.py)
    variables_shape = jax.eval_shape(
        lambda: model.init({'params': jax.random.key(0)},
                           image, intrinsics, extrinsics, ego, None, train=False))
    out_shape = jax.eval_shape(
        lambda v: model.apply(v, image, intrinsics, extrinsics, ego, None,
                              train=False),
        variables_shape)

    # output frame count: present + future frames after the receptive field
    rf = 3 if cfg.MODEL.SUBSAMPLE else cfg.TIME_RECEPTIVE_FIELD
    n_out = 1 + (cfg.N_FUTURE_FRAMES // 2 if cfg.MODEL.SUBSAMPLE
                 else cfg.N_FUTURE_FRAMES)
    from fiery_tpu.utils.geometry import calculate_birds_eye_view_parameters
    _, _, dim = calculate_birds_eye_view_parameters(
        cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
    X, Y = int(dim[0]), int(dim[1])

    seg = out_shape['segmentation']
    assert seg.shape == (b, n_out, X, Y, len(cfg.SEMANTIC_SEG.WEIGHTS)), rel
    assert out_shape['instance_center'].shape == (b, n_out, X, Y, 1), rel
    assert out_shape['instance_offset'].shape == (b, n_out, X, Y, 2), rel
    if cfg.INSTANCE_FLOW.ENABLED:
        assert out_shape['instance_flow'].shape == (b, n_out, X, Y, 2), rel
    for key, v in out_shape.items():
        if v is not None:
            assert v.dtype == jnp.float32, (rel, key)
