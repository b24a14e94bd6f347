"""Host-only data-loader throughput (round-4 VERDICT next #5).

Measures the real-data pipeline with NO device in the loop — the number that
must exceed the device step rate for training to be input-bound-free. SURVEY
§7 flags host decode + rasterise (7 frames x 6 cams of JPEG per sample,
reference data.py:345-426) as the likely real-data bottleneck at >=5x device
speedup.

Three measurements on a synthetic on-disk nuScenes tree
(tools/make_fake_nuscenes.py — real JPEG files, real table indexing):

  1. per-stage single-process breakdown: time dataset.get_input_data (JPEG
     decode -> resize -> crop -> normalise) vs get_label_cached (cv2
     rasterise + label gen) vs the rest of __getitem__;
  2. single-process loader clips/s (the per-core rate — multiply by worker
     cores on a real TPU host);
  3. worker-pool loader clips/s over a --workers sweep (bounded by this
     box's core count: nproc=1 here, so the sweep proves the pool plumbing
     and the per-core rate, not a 32-core host's aggregate).

Usage:
    python tools/loader_bench.py [--dataroot DIR] [--samples 24]
        [--workers 0,1,2] [--batches 8] [--no-native] [--prewarp]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_tree(dataroot, samples):
    marker = os.path.join(dataroot, 'mini', 'v1.0-mini', 'sample.json')
    if os.path.exists(marker):
        return
    print(f'building fake nuScenes tree at {dataroot} ({samples} samples) ...',
          flush=True)
    subprocess.run([sys.executable,
                    os.path.join(REPO, 'tools', 'make_fake_nuscenes.py'),
                    dataroot, '--samples', str(samples)], check=True)


def make_cfg(dataroot, workers, prewarp, batch, fast_decode=False):
    from fiery_tpu.utils.config import get_cfg
    return get_cfg(cfg_dict={
        'BATCHSIZE': batch, 'N_WORKERS': workers,
        'DATASET': {'NAME': 'nuscenes', 'DATAROOT': dataroot,
                    'VERSION': 'mini', 'PREWARP_LABELS': prewarp,
                    'FAST_DECODE': fast_decode},
    })


def stage_breakdown(cfg, n_samples=6):
    """Single-process per-stage wall time via method wrappers."""
    from fiery_tpu.data.nuscenes_dataset import build_real_datasets
    train_ds, _ = build_real_datasets(cfg)
    acc = {'input_data': 0.0, 'labels': 0.0}

    orig_input = train_ds.get_input_data
    orig_label = train_ds.get_label_cached

    def timed_input(rec):
        t = time.perf_counter()
        out = orig_input(rec)
        acc['input_data'] += time.perf_counter() - t
        return out

    def timed_label(rec, instance_map):
        t = time.perf_counter()
        out = orig_label(rec, instance_map)
        acc['labels'] += time.perf_counter() - t
        return out

    train_ds.get_input_data = timed_input
    train_ds.get_label_cached = timed_label
    n = min(n_samples, len(train_ds))
    train_ds[0]   # warm caches (label cache, native pipe load)
    for k in acc:
        acc[k] = 0.0
    t0 = time.perf_counter()
    for i in range(n):
        train_ds[i % len(train_ds)]
    total = time.perf_counter() - t0
    other = total - acc['input_data'] - acc['labels']
    return {
        'n_samples': n,
        'total_ms_per_clip': round(1000 * total / n, 1),
        'image_pipeline_ms_per_clip': round(1000 * acc['input_data'] / n, 1),
        'label_gen_ms_per_clip': round(1000 * acc['labels'] / n, 1),
        'other_ms_per_clip': round(1000 * other / n, 1),
        'single_process_clips_per_sec': round(n / total, 2),
    }


def loader_rate(cfg, n_batches):
    """Worker-pool loader clips/s (the prepare_dataloaders path train.py uses)."""
    from fiery_tpu.data.dataset import prepare_dataloaders
    loader, _ = prepare_dataloaders(cfg)
    try:
        it = iter(loader)
        first = next(it)            # pool spin-up + first prefetch outside timing
        assert np.isfinite(first['intrinsics']).all()
        n_done = 0
        t0 = time.perf_counter()
        while n_done < n_batches:
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                continue
            n_done += 1
        elapsed = time.perf_counter() - t0
        return round(n_done * cfg.BATCHSIZE / elapsed, 2)
    finally:
        loader.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataroot', default='/tmp/fake_nusc_loaderbench')
    ap.add_argument('--samples', type=int, default=24)
    ap.add_argument('--batch', type=int, default=3)
    ap.add_argument('--batches', type=int, default=8)
    ap.add_argument('--workers', default='0,1,2',
                    help='comma list; 0 = in-process (no pool)')
    ap.add_argument('--no-native', action='store_true',
                    help='disable the C++ image pipe (PIL fallback A/B)')
    ap.add_argument('--fast-decode', action='store_true',
                    help='DATASET.FAST_DECODE: DCT-domain scaled JPEG decode '
                         '(approximate, ~1.8x the image pipeline)')
    ap.add_argument('--prewarp', action='store_true',
                    help='include the host label pre-warp in the pipeline')
    args = ap.parse_args()

    if args.no_native:
        os.environ['FIERY_TPU_NO_NATIVE'] = '1'
    ensure_tree(args.dataroot, args.samples)

    result = {'native_pipe': not args.no_native, 'prewarp': args.prewarp,
              'nproc': os.cpu_count()}
    result['fast_decode'] = args.fast_decode
    cfg0 = make_cfg(args.dataroot, 0, args.prewarp, args.batch,
                    args.fast_decode)
    result['stage_breakdown'] = stage_breakdown(cfg0)
    print(json.dumps({'stage_breakdown': result['stage_breakdown']}),
          flush=True)

    result['loader_clips_per_sec'] = {}
    for w in [int(x) for x in args.workers.split(',')]:
        cfg = make_cfg(args.dataroot, w, args.prewarp, args.batch,
                       args.fast_decode)
        rate = loader_rate(cfg, args.batches)
        result['loader_clips_per_sec'][f'workers_{w}'] = rate
        print(f'workers={w}: {rate} clips/s', flush=True)

    print(json.dumps(result))


if __name__ == '__main__':
    main()
