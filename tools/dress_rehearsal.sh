#!/bin/bash
# Real-data-path CLI dress rehearsal (round-2 VERDICT #5): run the actual entry
# points against an on-disk v1.0-mini-shaped synthetic nuScenes tree — the
# closest this environment gets to nuScenes (no real data available).
# train/evaluate run on the TPU (full debug_baseline model); parity --stages
# runs the tiny twin on CPU. Run items ONE at a time (remote compiles use host
# CPU). Usage: nohup bash tools/dress_rehearsal.sh > /tmp/rehearsal.log 2>&1 &
set -x
cd /root/repo
TREE=/tmp/fakenusc
LOGS=/tmp/rehearsal_runs

# 0. generate the tree (2 train scenes + 1 val scene x 9 keyframes, real JPEGs)
python tools/make_fake_nuscenes.py $TREE --train-scenes 2 --val-scenes 1 --samples 9

# 1. train.py, 2 epochs, mini split, checkpoints + TB logs
timeout 3600 python train.py --config-file fiery_tpu/configs/debug_baseline.yml \
    DATASET.DATAROOT $TREE LOG_DIR $LOGS TAG rehearsal || exit 1
CKPT=$(ls -d $LOGS/*_rehearsal/checkpoint_final | head -1)

# 2. evaluate.py on the produced checkpoint, device matching
timeout 3600 python evaluate.py --checkpoint "$CKPT" --dataroot $TREE \
    --version mini --device-matching || exit 1

# 3. visualise.py on the checkpoint (synthetic clip source; it takes npz clips,
#    not a dataroot)
timeout 1800 python visualise.py --checkpoint "$CKPT" || true

# 4. parity.py --stages with a fabricated Lightning-style 'released' checkpoint
#    (tiny twin; CPU) against the same tree: torch-vs-ours stage diffs on a
#    real-data batch + the metric table protocol end-to-end
python - <<'EOF'
import sys, torch
sys.path.insert(0, 'tests')
from torch_golden import GoldenFiery, prefixed_state_dict, randomize_bn_stats, randomize_bn3d_stats
from fiery_tpu.utils.config import get_cfg
TINY = {
    'TIME_RECEPTIVE_FIELD': 3, 'N_FUTURE_FRAMES': 2, 'BATCHSIZE': 1,
    'PRECISION': 32,
    'IMAGE': {'FINAL_DIM': (64, 96),
              'NAMES': ['CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
                        'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT']},
    'LIFT': {'X_BOUND': [-8.0, 8.0, 0.5], 'Y_BOUND': [-8.0, 8.0, 0.5],
             'D_BOUND': [2.0, 8.0, 1.0]},
    'MODEL': {'ENCODER': {'NAME': 'efficientnet-b0', 'OUT_CHANNELS': 16},
              'TEMPORAL_MODEL': {'START_OUT_CHANNELS': 16},
              'DISTRIBUTION': {'LATENT_DIM': 4},
              'FUTURE_PRED': {'N_GRU_BLOCKS': 2, 'N_RES_LAYERS': 2}},
}
cfg = get_cfg(cfg_dict=TINY)
torch.manual_seed(11)
g = GoldenFiery(C=16, D=6, final_dim=(64, 96), d_bound=(2.0, 8.0, 1.0),
                x_bound=(-8.0, 8.0, 0.5), y_bound=(-8.0, 8.0, 0.5),
                receptive_field=3, n_future=2, latent_dim=4,
                start_out_channels=16, n_gru_blocks=2, n_res_layers=2,
                future_in_channels=16 + 2 * 6, version='b0')
randomize_bn_stats(g, seed=5); randomize_bn3d_stats(g.temporal_model, seed=6)
g.eval()
torch.save({'state_dict': prefixed_state_dict(g, 'model.'),
            'hyper_parameters': cfg.convert_to_dict(),
            'epoch': 19, 'global_step': 12345}, '/tmp/fake_fiery.ckpt')
print('wrote /tmp/fake_fiery.ckpt')
EOF
# (runs on the TPU: sitecustomize forces platform axon; the tiny twin compiles
# in ~1 min. torch side is CPU either way.)
timeout 3600 python parity.py --torch-checkpoint /tmp/fake_fiery.ckpt \
    --dataroot $TREE --version mini --stages --max-batches 2 --device-matching

# 5. Lyft-shaped tree (same table schema under trainval/train_data, plain
#    category names, index-based splits): train one epoch + evaluate. The
#    window MUST be the reference TRF 5 / NFF 10 (MODEL.SUBSAMPLE hardcodes
#    the subsampled rf=3/nf=5; FieryConfig rejects other windows).
LTREE=/tmp/fake_lyft_rehearsal
python tools/make_fake_nuscenes.py $LTREE --lyft --train-scenes 2 --val-scenes 2 \
    --samples 16 --width 480 --height 270
timeout 3600 python train.py --config-file fiery_tpu/configs/lyft/debug_lyft.yml \
    DATASET.DATAROOT $LTREE LOG_DIR $LOGS TAG lyft_rehearsal \
    EPOCHS 1 \
    IMAGE.ORIGINAL_HEIGHT 270 IMAGE.ORIGINAL_WIDTH 480 \
    IMAGE.RESIZE_SCALE 0.5 IMAGE.FINAL_DIM "(96, 240)" IMAGE.TOP_CROP 39 \
    LIFT.X_BOUND "[-16.0, 16.0, 0.5]" LIFT.Y_BOUND "[-16.0, 16.0, 0.5]" \
    MODEL.ENCODER.NAME efficientnet-b0 MODEL.ENCODER.OUT_CHANNELS 16 \
    MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS 16 MODEL.DISTRIBUTION.LATENT_DIM 4 \
    MODEL.FUTURE_PRED.N_GRU_BLOCKS 1 MODEL.FUTURE_PRED.N_RES_LAYERS 1 || exit 1
LCKPT=$(ls -d $LOGS/*_lyft_rehearsal/checkpoint_final | head -1)
timeout 3600 python evaluate.py --checkpoint "$LCKPT" --device-matching || exit 1
