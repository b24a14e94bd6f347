#!/bin/bash
# Round-5 TPU measurement queue — run ONE at a time (remote compiles use host
# CPU; never run concurrently with pytest/accuracy_ab). Every bench invocation
# now runs the tunnel-sync self-probe first and pays the one-time ~3-4 min
# device->host channel init (CLAUDE.md round-5 notes), then validity-gates the
# JSON (physically impossible ratios -> "invalid": true).
# Usage: nohup bash tools/measure_r5.sh > /tmp/measure_r5.log 2>&1 &
set -x
cd /root/repo
# 0. tunnel probe
timeout 90 python -c "import jax; print(jax.devices())" || exit 1
# 1. serving A/B back-to-back (the pending measure_r4 steps 1-2): unpacked
#    eval (FIERY_PACKED_SPACE_EVAL=1, the default) vs packed. Expect the
#    default to recover ~32.5 clips/s and SPACE_EVAL=2 ~27.
timeout 2400 python bench.py --mode eval --topk 8 --warp-free --precision 16
FIERY_PACKED_SPACE_EVAL=2 timeout 2400 python bench.py --mode eval --topk 8 --warp-free --precision 16
# 2. serving e2e at the default (vs r3's 22.12 clips/s)
timeout 2400 python bench.py --mode eval-e2e --topk 8 --warp-free --precision 16
# 3. headline refresh with TRUSTED timing: default bench = best-config train
#    (all packing) + dense parity in one process (expect ~9.7 / ~7.0 clips/s,
#    ms_per_step within ~10% of packed_space_ab's 307 ms)
timeout 5400 python bench.py
# 4. per-fusion attribution at the ~307 ms best train config: where does the
#    next lever go? (splat share vs GRU/temporal/decoder/encoder residue)
timeout 2400 python tools/profile_step.py --topk 8 --warp-free --prewarp
