"""AOT export artifact (export.py / utils/export_lib.py): roundtrip parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from fiery_tpu.data.synthetic import SyntheticFutureDataset
from fiery_tpu.utils.config import get_cfg
from fiery_tpu.utils.export_lib import export_model, load_exported


def tiny_cfg():
    return get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 1,
        'IMAGE': {'FINAL_DIM': (16, 32), 'NAMES': ['CAM_A']},
        'LIFT': {'X_BOUND': [-4.0, 4.0, 0.5], 'Y_BOUND': [-4.0, 4.0, 0.5],
                 'D_BOUND': [2.0, 4.0, 1.0]},
        'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 8},
                  'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 8},
                  'DISTRIBUTION': {'LATENT_DIM': 2},
                  'FUTURE_PRED': {'N_GRU_BLOCKS': 1, 'N_RES_LAYERS': 1}},
    })


def test_export_roundtrip(tmp_path):
    cfg = tiny_cfg()
    blob, variables, fn = export_model(cfg, batch=2)
    path = tmp_path / 'model.fiery'
    path.write_bytes(blob)

    loaded_fn, params = load_exported(str(path))
    ds = SyntheticFutureDataset(cfg, n_samples=2, n_instances=1, seed=0)
    b = ds.get_batch([0, 1])
    inputs = tuple(jnp.asarray(b[k]) for k in
                   ['image', 'intrinsics', 'extrinsics', 'future_egomotion'])
    got = loaded_fn(params, *inputs)
    want = fn(variables, *inputs)
    for k, w in want.items():
        if w is None:
            assert got.get(k) is None
            continue
        # atol covers AOT-vs-jit reduction-order noise (fused-conv GEMM splits
        # differ between the two compiles; observed max ~2e-5 on O(1) outputs)
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(w), atol=5e-5)


def test_export_rejects_garbage(tmp_path):
    p = tmp_path / 'bad.fiery'
    p.write_bytes(b'not an artifact')
    with pytest.raises(ValueError):
        load_exported(str(p))
