#!/bin/bash
# Round-4 TPU measurement queue — run ONE at a time (remote compiles use host
# CPU; never run concurrently with pytest/accuracy_ab).
# Usage: nohup bash tools/measure_r4.sh > /tmp/measure_r4.log 2>&1 &
#
# Context (CLAUDE.md round-4 section): with all packing ON the train headline
# measured 9.77 clips/s (307 ms) but serving regressed 27.1 vs 32.5 clips/s;
# FIERY_PACKED_SPACE_EVAL=1 (the new default) lowers serving unpacked.
set -x
cd /root/repo
# 0. tunnel probe
timeout 90 python -c "import jax; print(jax.devices())" || exit 1
# 1. serving A/B back-to-back: unpacked eval (new default) vs packed eval.
#    Expect the default to recover ~32.5 clips/s and SPACE_EVAL=2 ~27.
timeout 1800 python bench.py --mode eval --topk 8 --warp-free --precision 16
FIERY_PACKED_SPACE_EVAL=2 timeout 1800 python bench.py --mode eval --topk 8 --warp-free --precision 16
# 2. serving e2e at the default (vs r3's 22.12 clips/s)
timeout 1800 python bench.py --mode eval-e2e --topk 8 --warp-free --precision 16
# 3. headline refresh: default bench = best-config train (all packing) +
#    dense parity in one process (expect ~9.7 / ~7.0 clips/s)
timeout 4800 python bench.py
# 4. per-fusion attribution at the 307 ms best train config: where does the
#    next round go? (splat share vs GRU/temporal/decoder residue)
timeout 2400 python tools/profile_step.py --topk 8 --warp-free --prewarp
