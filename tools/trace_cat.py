"""Categorise TPU-plane op durations from the captured trace into buckets."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import collections
import re
import sys

from fiery_tpu.utils.profiling import summarise_trace

ranked, planes = summarise_trace(sys.argv[1] if len(sys.argv) > 1 else '/tmp/trace_r2',
                                 top=100000)

buckets = collections.defaultdict(float)
examples = collections.defaultdict(list)
module_total = 0.0
for name, us in ranked:
    if name.startswith('jit_') or re.fullmatch(r'\d+', name):
        module_total = max(module_total, us)
        continue
    if 'copy-start' in name or 'slice-start' in name or 'async-start' in name \
            or 'copy-done' in name or 'slice-done' in name or 'async-done' in name:
        cat = 'async-window (overlapped)'
    elif '%convolution' in name or 'conv' in name.split('=')[0]:
        cat = 'convolution'
    elif '%sort' in name or 'top_k' in name:
        cat = 'sort/top-k'
    elif 'kCustom' in name and ('600000' in name or '4354560' in name or '480000' in name or '240000' in name):
        cat = 'gather/scatter custom (splat ids, warps)'
    elif '4354560' in name or '360009' in name or '40001' in name:
        cat = 'splat (segment-sum/gather/point-volume)'
    elif 'reduce' in name:
        cat = 'reduce fusions (BN stats, loss reductions)'
    elif '%copy' in name.split('=')[0] or 'bitcast' in name.split('=')[0]:
        cat = 'sync copies / layout'
    elif 'fusion' in name.split('=')[0] or 'add_any' in name or 'select' in name \
            or 'multiply' in name or 'subtract' in name or 'divide' in name:
        cat = 'elementwise fusions'
    else:
        cat = 'other'
    buckets[cat] += us
    if len(examples[cat]) < 6:
        examples[cat].append((us, name[:130]))

total = sum(buckets.values())
print(f'module-line total (3 steps, inflated): {module_total/1e6:.1f}s')
print(f'categorised device-op total: {total/1e6:.1f}s  '
      f'(proportions below; scale to ~509 ms/step)')
for cat, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f'{us/1e3:10.0f} ms  {100*us/total:5.1f}%  ~{0.509*1e3*us/total:6.1f} ms/step  {cat}')
print()
for cat, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f'== {cat}')
    for u, n in examples[cat]:
        print(f'   {u/1e3:9.1f} ms  {n}')
