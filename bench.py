"""Benchmark harness: 6-cam clips/sec/chip on the baseline.yml model (real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (round 1): eval-mode forward of the full baseline model (6 cameras, 224x480,
T=3 past frames, 4 future frames, BEV 200x200), batch 1, matching the reference
evaluation protocol (evaluate.py:28-29,56-59: single GPU, batch 1, zero-noise mean
prediction). vs_baseline is measured against an ESTIMATED PyTorch A100 reference
forward throughput of 2.0 clips/s (the reference publishes no throughput numbers —
BASELINE.json "published" is empty; this constant is a stand-in so the trend across
rounds is meaningful, not a measured A100 number).
"""

import json
import time

ESTIMATED_REFERENCE_CLIPS_PER_SEC = 2.0


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)

    # warmup/compile
    out = jfn(*args)
    jax.block_until_ready(out)

    n_iters = 10
    batch = args[1].shape[0]
    start = time.perf_counter()
    for _ in range(n_iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    clips_per_sec = n_iters * batch / elapsed
    print(json.dumps({
        'metric': 'baseline_eval_clips_per_sec_per_chip',
        'value': round(clips_per_sec, 4),
        'unit': 'clips/s',
        'vs_baseline': round(clips_per_sec / ESTIMATED_REFERENCE_CLIPS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
