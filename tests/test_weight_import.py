"""Weight importer structural test: round-trip a synthetically-named torch state dict.

Builds the real flax variable tree for a tiny config, fabricates a torch state_dict
with the exact reference parameter names (derived from the reference module tree) and
inverse-transposed shapes, imports it, and checks every mapped leaf lands on the right
flax path with the right layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiery_tpu.models.fiery import Fiery, FieryConfig
from fiery_tpu.utils.weight_import import (
    build_mapping, import_torch_state_dict, export_expected_torch_names,
)


@pytest.fixture(scope='module')
def model_and_vars():
    cfg = FieryConfig(
        time_receptive_field=3, n_future_frames=2,
        final_dim=(32, 48), x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5),
        d_bound=(2.0, 6.0, 1.0), encoder_name='efficientnet-b0',
        encoder_out_channels=16, start_out_channels=16, latent_dim=4,
        n_gru_blocks=2, n_res_layers=2)
    model = Fiery(cfg=cfg)
    rng = np.random.RandomState(0)
    b, s, n = 1, 5, 2
    image = jnp.asarray(rng.randn(b, s, n, 32, 48, 3).astype(np.float32))
    K = np.array([[20.0, 0, 24], [0, 20.0, 16], [0, 0, 1]], np.float32)
    intr = jnp.broadcast_to(jnp.asarray(K), (b, s, n, 3, 3))
    E = np.eye(4, dtype=np.float32)
    extr = jnp.broadcast_to(jnp.asarray(E), (b, s, n, 4, 4))
    ego = jnp.zeros((b, s, 6))
    fdi = jnp.zeros((b, 3, 32, 32, 6))
    variables = jax.jit(model.init, static_argnames='train')(
        {'params': jax.random.key(0), 'sample': jax.random.key(1),
         'dropout': jax.random.key(2)}, image, intr, extr, ego, fdi, train=False)
    return cfg, model, variables


def _get_in(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _inverse_transform(flax_value, transform_name):
    v = np.asarray(flax_value)
    if transform_name == '_conv2d':
        return np.transpose(v, (3, 2, 0, 1))
    if transform_name == '_conv3d_1x1':
        # (1, 1, C, O) -> (O, C, 1, 1, 1)
        return np.transpose(v, (3, 2, 0, 1))[..., None]
    if transform_name.startswith('_conv3d_causal'):
        kh, kw, ktc, o = v.shape
        kt = 2 if transform_name.endswith('kt2') else 1
        r = v.reshape(kh, kw, kt, ktc // kt, o)
        return np.transpose(r, (4, 3, 2, 0, 1))
    return v


def _fabricate(state_dict, torch_name, leaf, transform):
    """Write torch tensor(s) for one mapping entry into state_dict, inverting the
    transform. Fused entries (tuple of names) split the concatenated flax leaf into
    equal per-source slices before inverting the single-tensor transform."""
    leaf = np.asarray(leaf)
    if isinstance(torch_name, tuple):
        n = len(torch_name)
        base = {'_concat_conv2d': '_conv2d', '_concat_conv3d_1x1': '_conv3d_1x1',
                '_concat_id': '_id'}[transform.__name__]
        axis = 0 if base == '_id' else -1
        parts = np.split(leaf, n, axis=axis)
        for name, part in zip(torch_name, parts):
            state_dict[name] = _inverse_transform(part, base)
    else:
        state_dict[torch_name] = _inverse_transform(leaf, transform.__name__)


def test_mapping_covers_flax_tree(model_and_vars):
    """Every mapped flax path must exist in the real variable tree (no stale names)."""
    cfg, model, variables = model_and_vars
    mapping = build_mapping(cfg)
    assert len(mapping) > 100
    for flax_path, torch_name, transform, collection in mapping:
        leaf = _get_in(variables[collection], flax_path)  # raises KeyError if missing
        assert leaf is not None, torch_name


def test_mapping_covers_most_params(model_and_vars):
    """The mapping must address ~all trainable conv/BN parameters of the model."""
    cfg, model, variables = model_and_vars
    mapping = build_mapping(cfg)
    mapped = {tuple(p) for p, _, _, c in mapping if c == 'params'}
    all_paths = set()
    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                all_paths.add(prefix + (k,))
    walk(variables['params'], ())
    missing = all_paths - mapped
    assert not missing, f'unmapped flax params: {sorted(missing)[:10]}'


def test_import_round_trip(model_and_vars):
    """Fabricate a torch state dict from the flax tree, import it, expect equality."""
    cfg, model, variables = model_and_vars
    mapping = build_mapping(cfg)
    state_dict = {}
    for flax_path, torch_name, transform, collection in mapping:
        leaf = _get_in(variables[collection], flax_path)
        _fabricate(state_dict, torch_name, leaf, transform)
    state_dict['model.segmentation_weight'] = np.asarray(0.25)

    imported, uncertainty = import_torch_state_dict(state_dict, cfg,
                                                    variables=variables)
    assert uncertainty['segmentation_weight'] == 0.25
    for flax_path, torch_name, transform, collection in mapping:
        got = np.asarray(_get_in(imported[collection], flax_path))
        want = np.asarray(_get_in(variables[collection], flax_path))
        np.testing.assert_array_equal(got, want, err_msg=torch_name)


def test_import_strict_errors(model_and_vars):
    cfg, model, variables = model_and_vars
    with pytest.raises(KeyError):
        import_torch_state_dict({}, cfg, strict=True)
    # unknown extra key rejected under strict
    mapping = build_mapping(cfg)
    state_dict = {}
    for flax_path, torch_name, transform, collection in mapping:
        leaf = _get_in(variables[collection], flax_path)
        _fabricate(state_dict, torch_name, leaf, transform)
    state_dict['model.not_a_real_param'] = np.zeros(3)
    with pytest.raises(KeyError):
        import_torch_state_dict(state_dict, cfg, strict=True)


def test_expected_names_look_like_reference():
    cfg = FieryConfig(final_dim=(32, 48), encoder_name='efficientnet-b0',
                      encoder_out_channels=16, start_out_channels=16)
    names = export_expected_torch_names(cfg)
    assert 'model.encoder.backbone._conv_stem.weight' in names
    assert 'model.encoder.backbone._blocks.0._depthwise_conv.weight' in names
    assert 'model.decoder.layer2.0.downsample.0.weight' in names
    assert 'model.future_prediction.spatial_grus.0.conv_update.weight' in names
    assert 'model.present_distribution.last_conv.1.weight' in names
