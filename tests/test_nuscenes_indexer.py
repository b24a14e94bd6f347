"""Vendored nuScenes JSON indexer tested on a synthetic on-disk table tree.

Exercises the previously devkit-only real-data entry path end-to-end:
build_real_datasets -> NuScenesIndex(<dataroot>/<version>/*.json) ->
FuturePredictionDataset windows/labels/images, with devkit-parity derived fields
(sample['data'] keyframe map, sample['anns'], category_name via instance ->
category, channel via calibrated_sensor -> sensor) and official mini splits.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fiery_tpu.data.nuscenes_indexer import (MINI_TRAIN, MINI_VAL, NuScenesIndex,
                                             create_splits_scenes)
from fiery_tpu.utils.config import get_cfg

pytestmark = pytest.mark.fast


def _write_fixture_tree(root, lyft=False):
    """2 scenes (one mini_train, one mini_val) x 4 samples, 2 cams + lidar,
    1 moving car + 1 pedestrian (filtered) + 1 invisible car (filtered).

    With ``lyft=True`` the same tree is written Lyft-Level-5-shaped: tables in
    ``train_data/`` and plain category names ('car', 'pedestrian') — the Lyft
    dataset ships the identical JSON schema (reference data.py:403-416)."""
    table_dir = os.path.join(root, 'train_data' if lyft else 'v1.0-mini')
    os.makedirs(table_dir, exist_ok=True)
    os.makedirs(os.path.join(root, 'samples'), exist_ok=True)

    rng = np.random.RandomState(0)
    img_rel = 'samples/cam.jpg'
    Image.fromarray(rng.randint(0, 255, (64, 112, 3), dtype=np.uint8)).save(
        os.path.join(root, img_rel), quality=95)

    tables = {name: [] for name in
              ['category', 'attribute', 'visibility', 'instance', 'sensor',
               'calibrated_sensor', 'ego_pose', 'log', 'scene', 'sample',
               'sample_data', 'sample_annotation']}

    tables['category'] = [
        {'token': 'cat_car',
         'name': 'car' if lyft else 'vehicle.car', 'description': ''},
        {'token': 'cat_ped',
         'name': 'pedestrian' if lyft else 'human.pedestrian.adult',
         'description': ''},
    ]
    tables['visibility'] = [
        {'token': str(v), 'level': f'v{v}', 'description': ''} for v in range(1, 5)]
    tables['sensor'] = [
        {'token': 'sen_lidar', 'channel': 'LIDAR_TOP', 'modality': 'lidar'},
        {'token': 'sen_front', 'channel': 'CAM_FRONT', 'modality': 'camera'},
        {'token': 'sen_back', 'channel': 'CAM_BACK', 'modality': 'camera'},
    ]
    cam_rot = [0.5, -0.5, 0.5, -0.5]
    for sen in ['lidar', 'front', 'back']:
        tables['calibrated_sensor'].append({
            'token': f'cal_{sen}', 'sensor_token': f'sen_{sen}',
            'rotation': [1.0, 0, 0, 0] if sen == 'lidar' else cam_rot,
            'translation': [0.0, 0.0, 1.8] if sen == 'lidar' else [1.5, 0.0, 1.6],
            'camera_intrinsic': [] if sen == 'lidar' else
                [[100.0, 0, 56.0], [0, 100.0, 32.0], [0, 0, 1]],
        })

    scene_names = [MINI_TRAIN[0], MINI_VAL[0]]
    for scene_i, scene_name in enumerate(scene_names):
        scene_token = f'scene{scene_i}'
        n_samples = 4
        tables['log'].append({'token': f'log{scene_i}', 'location': 'x'})
        tables['scene'].append({
            'token': scene_token, 'name': scene_name, 'log_token': f'log{scene_i}',
            'nbr_samples': n_samples, 'first_sample_token': f's{scene_i}_0',
            'last_sample_token': f's{scene_i}_{n_samples - 1}'})
        tables['instance'].append({
            'token': f'car_{scene_i}', 'category_token': 'cat_car',
            'nbr_annotations': n_samples})
        tables['instance'].append({
            'token': f'ped_{scene_i}', 'category_token': 'cat_ped',
            'nbr_annotations': n_samples})
        tables['instance'].append({
            'token': f'ghost_{scene_i}', 'category_token': 'cat_car',
            'nbr_annotations': n_samples})
        for t in range(n_samples):
            token = f's{scene_i}_{t}'
            tables['sample'].append({
                'token': token, 'scene_token': scene_token,
                'timestamp': 1_000_000 * t,
                'prev': f's{scene_i}_{t - 1}' if t else '',
                'next': f's{scene_i}_{t + 1}' if t < n_samples - 1 else ''})
            ego_token = f'ego_{scene_i}_{t}'
            tables['ego_pose'].append({
                'token': ego_token, 'rotation': [1.0, 0, 0, 0],
                'translation': [2.0 * t, 0.0, 0.0], 'timestamp': 1_000_000 * t})
            for sen, cal in [('LIDAR_TOP', 'cal_lidar'), ('CAM_FRONT', 'cal_front'),
                             ('CAM_BACK', 'cal_back')]:
                tables['sample_data'].append({
                    'token': f'sd_{sen}_{scene_i}_{t}', 'sample_token': token,
                    'ego_pose_token': ego_token,
                    'calibrated_sensor_token': cal,
                    'filename': img_rel, 'fileformat': 'jpg',
                    'is_key_frame': True, 'height': 64, 'width': 112,
                    'timestamp': 1_000_000 * t, 'prev': '', 'next': ''})
            # a non-keyframe sweep that must NOT land in sample['data']
            tables['sample_data'].append({
                'token': f'sd_sweep_{scene_i}_{t}', 'sample_token': token,
                'ego_pose_token': ego_token,
                'calibrated_sensor_token': 'cal_front',
                'filename': img_rel, 'fileformat': 'jpg',
                'is_key_frame': False, 'height': 64, 'width': 112,
                'timestamp': 1_000_000 * t + 50, 'prev': '', 'next': ''})
            # visible car (kept), pedestrian (category-filtered),
            # invisible car (visibility-filtered)
            tables['sample_annotation'].append({
                'token': f'ann_car_{scene_i}_{t}', 'sample_token': token,
                'instance_token': f'car_{scene_i}', 'visibility_token': '4',
                'translation': [2.0 * t + 10.0, 0.0, 0.5],
                'size': [2.0, 4.0, 1.5], 'rotation': [1.0, 0, 0, 0],
                'attribute_tokens': [], 'prev': '', 'next': ''})
            tables['sample_annotation'].append({
                'token': f'ann_ped_{scene_i}_{t}', 'sample_token': token,
                'instance_token': f'ped_{scene_i}', 'visibility_token': '4',
                'translation': [2.0 * t + 5.0, 3.0, 0.5],
                'size': [0.6, 0.6, 1.8], 'rotation': [1.0, 0, 0, 0],
                'attribute_tokens': [], 'prev': '', 'next': ''})
            tables['sample_annotation'].append({
                'token': f'ann_ghost_{scene_i}_{t}', 'sample_token': token,
                'instance_token': f'ghost_{scene_i}', 'visibility_token': '1',
                'translation': [2.0 * t - 8.0, 2.0, 0.5],
                'size': [2.0, 4.0, 1.5], 'rotation': [1.0, 0, 0, 0],
                'attribute_tokens': [], 'prev': '', 'next': ''})

    for name, records in tables.items():
        with open(os.path.join(table_dir, name + '.json'), 'w') as f:
            json.dump(records, f)
    return root


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    # layout: <parent>/mini/{v1.0-mini/*.json, samples/*} — build_real_datasets
    # joins DATAROOT/<version> (nuscenes_dataset.py:441)
    parent = str(tmp_path_factory.mktemp('nusc_tree'))
    root = os.path.join(parent, 'mini')
    os.makedirs(root)
    return _write_fixture_tree(root)


@pytest.fixture(scope='module')
def cfg():
    return get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 1,
        'DATASET': {'VERSION': 'mini', 'NAME': 'nuscenes'},
        'IMAGE': {'FINAL_DIM': (24, 48), 'RESIZE_SCALE': 0.5, 'TOP_CROP': 2,
                  'ORIGINAL_HEIGHT': 64, 'ORIGINAL_WIDTH': 112,
                  'NAMES': ['CAM_FRONT', 'CAM_BACK']},
        'LIFT': {'X_BOUND': [-16.0, 16.0, 1.0], 'Y_BOUND': [-16.0, 16.0, 1.0]},
    })


def test_index_decoration(dataroot):
    nusc = NuScenesIndex('v1.0-mini', dataroot)
    assert len(nusc.sample) == 8
    s = nusc.get('sample', 's0_0')
    # keyframe channel map excludes the sweep; anns in table order
    assert set(s['data']) == {'LIDAR_TOP', 'CAM_FRONT', 'CAM_BACK'}
    assert s['data']['CAM_FRONT'] == 'sd_CAM_FRONT_0_0'
    assert s['anns'] == ['ann_car_0_0', 'ann_ped_0_0', 'ann_ghost_0_0']
    ann = nusc.get('sample_annotation', 'ann_ped_0_0')
    assert ann['category_name'] == 'human.pedestrian.adult'
    sd = nusc.get('sample_data', 'sd_CAM_BACK_0_1')
    assert sd['channel'] == 'CAM_BACK'
    assert sd['sensor_modality'] == 'camera'
    # scene/ego_pose table attributes (devkit style)
    assert len(nusc.scene) == 2
    assert nusc.get('ego_pose', 'ego_0_2')['translation'][0] == 4.0


def test_build_real_datasets_end_to_end(dataroot, cfg):
    from fiery_tpu.data.nuscenes_dataset import build_real_datasets
    cfg = cfg.clone()
    cfg.DATASET.DATAROOT = os.path.dirname(dataroot)  # <parent>; joined with 'mini'
    train, val = build_real_datasets(cfg)

    # split routing: train sees only the mini_train scene, val the mini_val scene
    assert {r['scene_token'] for r in train.ixes} == {'scene0'}
    assert {r['scene_token'] for r in val.ixes} == {'scene1'}
    # 4 samples, window 3 -> 2 windows per scene
    assert len(train) == 2 and len(val) == 2

    sample = train[0]
    assert sample['image'].shape == (3, 2, 24, 48, 3)
    assert sample['image'].dtype == np.uint8
    assert sample['intrinsics'].shape == (3, 2, 3, 3)
    assert sample['extrinsics'].shape == (3, 2, 4, 4)
    assert sample['segmentation'].shape == (3, 32, 32, 1)
    # exactly one instance rasterised: the visible car (ped + invisible filtered)
    assert set(np.unique(sample['instance'])) == {0, 1}
    assert sample['segmentation'].sum() > 0
    # car is 10 m ahead, ego advances 2 m per frame, car moves with ego ->
    # instance mask static across frames
    assert (sample['instance'][0] == sample['instance'][1]).all()
    # future egomotion = pose of frame t in frame t+1: ego advances +2 m in x,
    # so the old origin sits at -2 m in the next frame
    np.testing.assert_allclose(sample['future_egomotion'][0, :3], [-2.0, 0, 0],
                               atol=1e-5)


@pytest.fixture(scope='module')
def lyft_dataroot(tmp_path_factory):
    # layout: <parent>/trainval/{train_data/*.json, samples/*} —
    # build_real_datasets joins DATAROOT/'trainval' and points the index at
    # the 'train_data' table dir (nuscenes_dataset.py lyft branch)
    parent = str(tmp_path_factory.mktemp('lyft_tree'))
    root = os.path.join(parent, 'trainval')
    os.makedirs(root)
    return _write_fixture_tree(root, lyft=True)


def test_lyft_index_end_to_end(lyft_dataroot, cfg, monkeypatch):
    """Vendored-index Lyft path: same JSON schema, train_data/ table dir,
    index-based splits, plain category names, NO visibility filtering."""
    from fiery_tpu.data import nuscenes_dataset
    from fiery_tpu.data.nuscenes_dataset import build_real_datasets
    # the real split constants index 180 scenes; the fixture has 2
    monkeypatch.setattr(nuscenes_dataset, 'TRAIN_LYFT_INDICES', [0])
    monkeypatch.setattr(nuscenes_dataset, 'VAL_LYFT_INDICES', [1])
    cfg = cfg.clone()
    cfg.defrost()
    cfg.DATASET.NAME = 'lyft'
    cfg.DATASET.DATAROOT = os.path.dirname(lyft_dataroot)
    cfg.freeze()
    train, val = build_real_datasets(cfg)
    assert {r['scene_token'] for r in train.ixes} == {'scene0'}
    assert {r['scene_token'] for r in val.ixes} == {'scene1'}
    assert len(train) == 2 and len(val) == 2

    sample = train[0]
    assert sample['image'].shape == (3, 2, 24, 48, 3)
    # Lyft keeps BOTH cars: 'car' passes the category list and the
    # low-visibility ghost is NOT filtered (visibility is nuScenes-only);
    # the pedestrian is category-filtered
    assert set(np.unique(sample['instance'])) == {0, 1, 2}
    # lyft attribute label is always 0 (reference data.py:269-275)
    assert set(np.unique(sample['attribute'])) == {0}
    np.testing.assert_allclose(sample['future_egomotion'][0, :3], [-2.0, 0, 0],
                               atol=1e-5)


def test_splits_fallback_and_error(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv('FIERY_SPLITS_JSON', raising=False)
    splits = create_splits_scenes()
    assert splits['mini_train'] == MINI_TRAIN
    assert splits['mini_val'] == MINI_VAL
    with pytest.raises(RuntimeError, match='splits_scenes.json'):
        list(splits['train'])
    with pytest.raises(RuntimeError):
        'scene-0001' in splits['val']
    # user-dropped splits file is picked up
    with open('splits_scenes.json', 'w') as f:
        json.dump({'train': ['scene-0001'], 'val': ['scene-0002']}, f)
    splits = create_splits_scenes()
    assert splits['train'] == ['scene-0001']
    assert splits['mini_val'] == MINI_VAL
