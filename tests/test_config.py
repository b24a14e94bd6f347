import os
import textwrap

import pytest

from fiery_tpu.utils.config import get_cfg, get_parser, CfgNode

pytestmark = pytest.mark.fast


def test_defaults():
    cfg = get_cfg()
    assert cfg.TIME_RECEPTIVE_FIELD == 3
    assert cfg.N_FUTURE_FRAMES == 4
    assert cfg.LIFT.X_BOUND == [-50.0, 50.0, 0.5]
    assert cfg.MODEL.ENCODER.NAME == 'efficientnet-b4'
    assert cfg.SEMANTIC_SEG.WEIGHTS == [1.0, 2.0]
    assert cfg.PROBABILISTIC.WEIGHT == 100.0


def test_base_inheritance(tmp_path):
    base = tmp_path / 'base.yml'
    base.write_text(textwrap.dedent("""
        TAG: 'base'
        BATCHSIZE: 8
        MODEL:
          TEMPORAL_MODEL:
            NAME: 'identity'
    """))
    child = tmp_path / 'child.yml'
    child.write_text(textwrap.dedent("""
        _BASE_: 'base.yml'
        TAG: 'child'
        TIME_RECEPTIVE_FIELD: 1
    """))
    parser = get_parser()
    args = parser.parse_args(['--config-file', str(child)])
    cfg = get_cfg(args)
    assert cfg.TAG == 'child'
    assert cfg.BATCHSIZE == 8              # inherited from base
    assert cfg.TIME_RECEPTIVE_FIELD == 1   # overridden in child
    assert cfg.MODEL.TEMPORAL_MODEL.NAME == 'identity'
    assert cfg.is_frozen()


def test_cli_overrides():
    parser = get_parser()
    args = parser.parse_args(['BATCHSIZE', '7', 'MODEL.ENCODER.NAME', 'efficientnet-b0',
                              'LIFT.X_BOUND', '[-16.0, 16.0, 0.1]'])
    cfg = get_cfg(args)
    assert cfg.BATCHSIZE == 7
    assert cfg.MODEL.ENCODER.NAME == 'efficientnet-b0'
    assert cfg.LIFT.X_BOUND == [-16.0, 16.0, 0.1]


def test_unknown_key_raises():
    parser = get_parser()
    args = parser.parse_args(['NOT_A_KEY', '1'])
    with pytest.raises(KeyError):
        get_cfg(args)


def test_frozen_is_immutable():
    parser = get_parser()
    cfg = get_cfg(parser.parse_args([]))
    with pytest.raises(AttributeError):
        cfg.BATCHSIZE = 1


def test_convert_to_dict_roundtrip():
    cfg = get_cfg()
    d = cfg.convert_to_dict()
    assert isinstance(d, dict)
    assert not isinstance(d['MODEL'], CfgNode)
    cfg2 = get_cfg(cfg_dict=d)
    assert cfg2.convert_to_dict() == d


def test_shipped_configs_parse():
    """All shipped YAMLs (mirroring the reference fiery/configs set) must load."""
    root = os.path.join(os.path.dirname(__file__), '..', 'fiery_tpu', 'configs')
    parser = get_parser()
    found = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith('.yml'):
                found.append(os.path.join(dirpath, f))
    assert len(found) >= 11
    for path in found:
        args = parser.parse_args(['--config-file', path])
        cfg = get_cfg(args)
        assert cfg.TAG


def test_unknown_config_key_rejected(tmp_path):
    """yacs parity: a typo'd key must raise, from cfg_dict, YAML and CLI alike
    (reference fvcore CfgNode 'Non-existent config key')."""
    import pytest
    with pytest.raises(KeyError, match='MODEL.NOT_A_KEY'):
        get_cfg(cfg_dict={'MODEL': {'NOT_A_KEY': 1}})
    bad_yaml = tmp_path / 'bad.yml'
    bad_yaml.write_text('MODEL:\n  ENCODR:\n    NAME: efficientnet-b0\n')
    parser = get_parser()
    with pytest.raises(KeyError, match='MODEL.ENCODR'):
        get_cfg(parser.parse_args(['--config-file', str(bad_yaml)]))
    with pytest.raises(KeyError):
        get_cfg(parser.parse_args(['BATCHSIZE_TYPO', '4']))


def test_checkpoint_restore_merge_drops_unknown_keys():
    """The checkpoint-restore path (get_cfg(..., cfg_dict_strict=False)) must warn
    and drop stale keys from older checkpoints instead of raising, while the
    user-facing strict merge still rejects them."""
    stale = {'BATCHSIZE': 7, 'REMOVED_TOP_KEY': 1,
             'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'GONE': True}}}
    with pytest.raises(KeyError):
        get_cfg(cfg_dict=stale)
    with pytest.warns(UserWarning, match='REMOVED_TOP_KEY'):
        cfg = get_cfg(cfg_dict=stale, cfg_dict_strict=False)
    assert cfg.BATCHSIZE == 7
    assert cfg.MODEL.ENCODER.NAME == 'efficientnet-b0'
    assert 'REMOVED_TOP_KEY' not in cfg
    assert 'GONE' not in cfg.MODEL.ENCODER


def test_cfgnode_pickle_roundtrip():
    """CfgNode must pickle (DataLoader forkserver workers receive the dataset —
    and its cfg — by pickle). Regression: __setitem__ consulted __immutable__
    via getattr, which raised during unpickling because pickle restores dict
    items before instance state."""
    import pickle

    cfg = get_cfg()
    thawed = pickle.loads(pickle.dumps(cfg))
    assert thawed == cfg
    assert isinstance(thawed.MODEL, CfgNode)

    cfg.freeze()
    frozen = pickle.loads(pickle.dumps(cfg))
    assert frozen.is_frozen()
    assert frozen.MODEL.ENCODER.is_frozen()  # freezing recurses; so must restore
    with pytest.raises(AttributeError):
        frozen.BATCHSIZE = 1
    with pytest.raises(AttributeError):
        frozen.MODEL.ENCODER.NAME = 'x'
    frozen.defrost()
    frozen.BATCHSIZE = 9
    assert frozen.BATCHSIZE == 9
