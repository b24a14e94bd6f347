"""A/B the instance-decode top-k lowering on the real TPU, one process.

``nosort`` (postprocess/instance.py `_top_k_scores_nosort` + the broadcast
relabel in make_instance_seg_consecutive) vs the stock ``topk`` lowering
(lax.top_k over the 40000-pixel peak map + scatter/gather relabel), measured
on the full serving pipeline (fwd + decode + JV matching) at the best serving
config (LIFT.TOPK=8, WARP_FREE) AND the dense parity config, back-to-back.
bench_eval_e2e defines its jitted closure fresh per call, so flipping the
module attribute between calls really retraces (see CLAUDE.md trace-cache
gotcha).

Usage: nohup python -u tools/decode_ab.py > /tmp/decode_ab.log 2>&1 &
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import fiery_tpu.postprocess.instance as instance
from bench import bench_eval_e2e

results = {}
for config_name, kw in [('best', dict(topk=8, warp_free=True)),
                        ('dense_parity', dict(topk=0, warp_free=False))]:
    for mode in ['nosort', 'topk', 'nosort']:   # repeat arm 1 to bound drift
        instance._DECODE_TOPK = mode
        clips = bench_eval_e2e(1, 16, n_iters=40, **kw)
        key = f'{config_name}_{mode}'
        results.setdefault(key, []).append(round(clips, 3))
        print(json.dumps({key: results[key]}), flush=True)
print(json.dumps(results), flush=True)
