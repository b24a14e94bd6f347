"""Round-5: serving packing ABA (FIERY_PACKED_SPACE_EVAL default decision).

With trusted timing (scalar-pull sync), the measure_r5 queue measured PACKED
serving at 37.57 clips/s vs 32.52 unpacked (+15.5%) — the OPPOSITE of the
round-4 conclusion (27.1 vs 32.5), which was taken with the broken
block_until_ready sync. Before flipping the serving default, confirm
back-to-back in ONE process, A-B-A to control drift (each bench_eval call
builds a fresh model, so the env flag is re-read per arm).

Usage: python tools/serving_eval_ab.py [iters]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
print('sync probe GB/s:', bench.tunnel_sync_probe(), flush=True)

results = []
for arm, flag in (('unpacked', '1'), ('packed2', '2'), ('unpacked', '1'),
                  ('packed2', '2')):
    os.environ['FIERY_PACKED_SPACE_EVAL'] = flag
    v = bench.bench_eval(batch=1, precision=16, n_iters=iters, fold_bn=True,
                         topk=8, warp_free=True)
    results.append((arm, round(v, 2)))
    print(f'RESULT eval topk8+warpfree [{arm}]: {v:.2f} clips/s', flush=True)
print('ABA summary:', results)

# e2e at the winning flag both ways
for arm, flag in (('unpacked', '1'), ('packed2', '2')):
    os.environ['FIERY_PACKED_SPACE_EVAL'] = flag
    v = bench.bench_eval_e2e(batch=1, precision=16, n_iters=iters, fold_bn=True,
                             topk=8, warp_free=True)
    print(f'RESULT eval-e2e topk8+warpfree [{arm}]: {v:.2f} clips/s', flush=True)
