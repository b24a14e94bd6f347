"""nuScenes dataset port tested against a fake devkit index (no nuscenes-devkit needed).

The fake implements the narrow interface the dataset uses (.sample, .get, .version);
scripted ego motion and annotations give closed-form expectations for windows,
extrinsics, rasterisation and future egomotion.
"""

import os

import numpy as np
import pytest
from PIL import Image

from fiery_tpu.data.nuscenes_dataset import (
    FuturePredictionDataset,
    box_bottom_corners,
    normalise_image,
    update_intrinsics_np,
)
from fiery_tpu.utils.config import get_cfg
from fiery_tpu.utils.quaternion import quat_to_rotation_matrix, quat_yaw, yaw_quat

pytestmark = pytest.mark.fast


class FakeNusc:
    """Minimal nuScenes-like index: 2 scenes x 5 samples, 2 cameras, 1 moving car."""

    version = 'v1.0-mini'

    def __init__(self, dataroot):
        self.dataroot = dataroot
        self._tables = {'scene': {}, 'sample_data': {}, 'ego_pose': {},
                        'calibrated_sensor': {}, 'sample_annotation': {}}
        self.sample = []

        # one camera calibration: forward-looking, cam z -> ego x, 1.5 m ahead
        cam_rot = [0.5, -0.5, 0.5, -0.5]  # maps camera (x right, y down, z fwd) -> ego
        self._tables['calibrated_sensor']['cal_front'] = {
            'camera_intrinsic': [[100.0, 0, 56.0], [0, 100.0, 32.0], [0, 0, 1]],
            'rotation': cam_rot, 'translation': [1.5, 0.0, 1.6],
        }

        img_file = 'cam.jpg'
        rng = np.random.RandomState(0)
        Image.fromarray(rng.randint(0, 255, (64, 112, 3), dtype=np.uint8)).save(
            os.path.join(dataroot, img_file), quality=95)

        for scene_i in range(2):
            scene_token = f'scene{scene_i}'
            self._tables['scene'][scene_token] = {'name': f'scene-{scene_i:04d}'}
            for t in range(5):
                token = f's{scene_i}_{t}'
                ego_token = f'ego_{scene_i}_{t}'
                # ego moves +2 m in x per step
                self._tables['ego_pose'][ego_token] = {
                    'rotation': [1.0, 0, 0, 0],
                    'translation': [2.0 * t, 0.0, 0.0],
                }
                data = {}
                for sensor in ['LIDAR_TOP', 'CAM_FRONT', 'CAM_BACK']:
                    sd_token = f'sd_{sensor}_{scene_i}_{t}'
                    self._tables['sample_data'][sd_token] = {
                        'ego_pose_token': ego_token,
                        'calibrated_sensor_token': 'cal_front',
                        'filename': img_file,
                    }
                    data[sensor] = sd_token
                # one car 10 m ahead of the ego, moving with it
                ann_token = f'ann_{scene_i}_{t}'
                self._tables['sample_annotation'][ann_token] = {
                    'category_name': 'vehicle.car',
                    'visibility_token': '4',
                    'instance_token': f'car_{scene_i}',
                    'translation': [2.0 * t + 10.0, 0.0, 0.5],
                    'size': [2.0, 4.0, 1.5],   # w, l, h
                    'rotation': [1.0, 0, 0, 0],
                }
                self.sample.append({
                    'token': token, 'scene_token': scene_token,
                    'timestamp': 1000 * t, 'data': data, 'anns': [ann_token],
                })

    def get(self, table, token):
        return self._tables[table][token]


class _FakeBackedDataset(FuturePredictionDataset):
    def get_scenes(self):  # bypass nuscenes-devkit split lookup
        names = sorted({self.nusc.get('scene', s['scene_token'])['name']
                        for s in self.nusc.sample})
        return names[:1] if not self.is_train else names


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('fake_nusc')
    nusc = FakeNusc(str(root))
    cfg = get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 1,
        'IMAGE': {'FINAL_DIM': (24, 48), 'RESIZE_SCALE': 0.5, 'TOP_CROP': 2,
                  'ORIGINAL_HEIGHT': 64, 'ORIGINAL_WIDTH': 112,
                  'NAMES': ['CAM_FRONT', 'CAM_BACK']},
        'LIFT': {'X_BOUND': [-16.0, 16.0, 1.0], 'Y_BOUND': [-16.0, 16.0, 1.0]},
    })
    return _FakeBackedDataset(nusc, True, cfg)


def test_windows_do_not_cross_scenes(dataset):
    # 2 scenes x 5 samples, window 3 -> 3 windows per scene
    assert len(dataset) == 6
    for window in dataset.indices:
        scene_tokens = {dataset.ixes[i]['scene_token'] for i in window}
        assert len(scene_tokens) == 1


def test_sample_shapes_and_layout(dataset):
    sample = dataset[0]
    assert sample['image'].shape == (3, 2, 24, 48, 3)
    # RAW uint8 post-crop frames (the exact reference intermediate,
    # data.py:211-219); ImageNet normalisation happens on device in the model
    assert sample['image'].dtype == np.uint8
    assert sample['intrinsics'].shape == (3, 2, 3, 3)
    assert sample['extrinsics'].shape == (3, 2, 4, 4)
    assert sample['segmentation'].shape == (3, 32, 32, 1)
    assert sample['instance'].shape == (3, 32, 32)
    assert sample['centerness'].shape == (3, 32, 32, 1)
    assert sample['offset'].shape == (3, 32, 32, 2)
    assert sample['flow'].shape == (3, 32, 32, 2)
    assert sample['future_egomotion'].shape == (3, 6)


def test_extrinsics_equal_sensor_calibration(dataset):
    """With identity ego rotation, sensor_to_lidar == the calibrated sensor pose."""
    sample = dataset[0]
    cal = dataset.nusc.get('calibrated_sensor', 'cal_front')
    expected = np.eye(4)
    expected[:3, :3] = quat_to_rotation_matrix(cal['rotation'])
    expected[:3, 3] = cal['translation']
    np.testing.assert_allclose(sample['extrinsics'][0, 0], expected, atol=1e-6)


def test_intrinsics_folding(dataset):
    sample = dataset[0]
    K = sample['intrinsics'][0, 0]
    # fx = 100 * 0.5; cx = 56*0.5 - crop_w(4); cy = 32*0.5 - top_crop(2)
    np.testing.assert_allclose(K[0, 0], 50.0)
    np.testing.assert_allclose(K[0, 2], 24.0)
    np.testing.assert_allclose(K[1, 2], 14.0)


def test_future_egomotion_constant_forward(dataset):
    sample = dataset[0]
    # ego advances +2 m/frame: pose of frame t in frame t+1 has tx = -2
    np.testing.assert_allclose(sample['future_egomotion'][0],
                               [-2.0, 0, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sample['future_egomotion'][1],
                               [-2.0, 0, 0, 0, 0, 0], atol=1e-6)


def test_instance_rasterised_at_expected_position(dataset):
    sample = dataset[0]
    inst = sample['instance'][0]
    assert inst.max() == 1
    xs, ys = np.nonzero(inst)
    # car center 10 m ahead -> bin x = (10 + 16)/1 = 26; y centered at 16
    assert 24 <= xs.mean() <= 28
    assert 14 <= ys.mean() <= 18
    # box is 4 m long x 2 m wide at 1 m resolution -> about 5x3 bins rasterised
    assert 8 <= len(xs) <= 24
    # instance persists across all 3 frames with the same id
    for t in range(3):
        assert set(np.unique(sample['instance'][t])) == {0, 1}


def test_instance_stationary_in_bev_when_comoving(dataset):
    """Car moves with the ego, so its BEV position (ego frame) is constant."""
    sample = dataset[0]
    pos0 = np.argwhere(sample['instance'][0] == 1).mean(0)
    pos2 = np.argwhere(sample['instance'][2] == 1).mean(0)
    np.testing.assert_allclose(pos0, pos2, atol=0.5)


def test_offset_and_flow_labels(dataset):
    sample = dataset[0]
    inst0 = sample['instance'][0] == 1
    offset = sample['offset'][0]
    assert (offset[~inst0] == 255).all()
    # inside the instance, offsets point to the center (zero mean)
    assert np.abs(offset[inst0].mean(0)).max() < 1.0
    # flow at t=0: car is static in world; ego moves +2 m -> warped center stays
    # (egomotion-subtracted flow) => small values, not ignore_index
    flow0 = sample['flow'][0]
    assert (np.abs(flow0[inst0]) < 255).all()


def test_box_bottom_corners():
    corners = box_bottom_corners([0, 0, 1.0], [2.0, 4.0, 2.0], [1, 0, 0, 0])
    assert corners.shape == (3, 4)
    np.testing.assert_allclose(sorted(corners[0]), [-2, -2, 2, 2])    # length/x
    np.testing.assert_allclose(sorted(corners[1]), [-1, -1, 1, 1])    # width/y
    np.testing.assert_allclose(corners[2], [0, 0, 0, 0])              # bottom z

def test_quaternion_yaw():
    q = yaw_quat(0.7)
    assert abs(quat_yaw(q) - 0.7) < 1e-9
    R = quat_to_rotation_matrix(q)
    np.testing.assert_allclose(R[:2, :2],
                               [[np.cos(0.7), -np.sin(0.7)],
                                [np.sin(0.7), np.cos(0.7)]], atol=1e-9)


def test_normalise_image_roundtrip():
    img = Image.fromarray(np.full((4, 4, 3), 128, np.uint8))
    out = normalise_image(img)
    expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-6)


def test_lyft_subsample_path(tmp_path_factory):
    """MODEL.SUBSAMPLE: every other frame kept, egomotions composed (data.py:403-416)."""
    root = tmp_path_factory.mktemp('fake_lyft')
    nusc = FakeNusc(str(root))
    cfg = get_cfg(cfg_dict={
        'TIME_RECEPTIVE_FIELD': 3, 'N_FUTURE_FRAMES': 1,   # window 4 -> subsampled to 2
        'MODEL': {'SUBSAMPLE': True},
        'IMAGE': {'FINAL_DIM': (24, 48), 'RESIZE_SCALE': 0.5, 'TOP_CROP': 2,
                  'ORIGINAL_HEIGHT': 64, 'ORIGINAL_WIDTH': 112,
                  'NAMES': ['CAM_FRONT', 'CAM_BACK']},
        'LIFT': {'X_BOUND': [-16.0, 16.0, 1.0], 'Y_BOUND': [-16.0, 16.0, 1.0]},
    })
    ds = _FakeBackedDataset(nusc, True, cfg)
    sample = ds[0]
    # window length 4 subsampled ::2 -> 2 frames
    assert sample['image'].shape[0] == 2
    assert sample['future_egomotion'].shape == (2, 6)
    # composed egomotion of two +2 m steps = one -4 m step (t0-in-t1 convention)
    np.testing.assert_allclose(sample['future_egomotion'][0],
                               [-4.0, 0, 0, 0, 0, 0], atol=1e-5)


def test_fiery_config_subsample_semantics():
    """Lyft subsample forces receptive_field 3 / n_future 5 (reference fiery.py:39-42)."""
    from fiery_tpu.models.fiery import FieryConfig
    cfg = FieryConfig(time_receptive_field=5, n_future_frames=10, subsample=True)
    assert cfg.receptive_field == 3
    assert cfg.n_future == 5
    # any other window crashes deep in label slicing -> rejected up front
    # (found by the Lyft CLI dress rehearsal: TRF 3/NFF 3 under SUBSAMPLE
    # IndexError'd inside visualise_output)
    with pytest.raises(ValueError, match='SUBSAMPLE'):
        FieryConfig(time_receptive_field=3, n_future_frames=3, subsample=True)


def test_label_cache_round_trip(tmp_path_factory):
    """Cached labels must equal freshly-rasterised ones, with window-consistent ids."""
    root = tmp_path_factory.mktemp('fake_nusc_cache')
    nusc = FakeNusc(str(root))
    cache = str(tmp_path_factory.mktemp('label_cache'))
    base = {
        'TIME_RECEPTIVE_FIELD': 2, 'N_FUTURE_FRAMES': 1,
        'IMAGE': {'FINAL_DIM': (24, 48), 'RESIZE_SCALE': 0.5, 'TOP_CROP': 2,
                  'ORIGINAL_HEIGHT': 64, 'ORIGINAL_WIDTH': 112,
                  'NAMES': ['CAM_FRONT']},
        'LIFT': {'X_BOUND': [-16.0, 16.0, 1.0], 'Y_BOUND': [-16.0, 16.0, 1.0]},
    }
    cfg_plain = get_cfg(cfg_dict=base)
    cfg_cached = get_cfg(cfg_dict={**base, 'DATASET': {'LABEL_CACHE_DIR': cache}})

    ds_plain = _FakeBackedDataset(nusc, True, cfg_plain)
    ds_cached = _FakeBackedDataset(nusc, True, cfg_cached)

    a = ds_plain[0]
    b = ds_cached[0]     # populates the cache
    c = ds_cached[0]     # reads from the cache
    for key in ['segmentation', 'instance', 'centerness', 'offset', 'flow']:
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
        np.testing.assert_array_equal(b[key], c[key], err_msg=key)
    import os
    assert len(os.listdir(ds_cached.label_cache_dir)) > 0
