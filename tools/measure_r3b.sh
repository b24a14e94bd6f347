#!/bin/bash
# Round-3 second TPU measurement queue — run ONE at a time (remote compiles use
# host CPU; never run concurrently with pytest/accuracy_ab).
# Usage: nohup bash tools/measure_r3b.sh > /tmp/measure_r3b.log 2>&1 &
set -x
cd /root/repo
# 0. tunnel probe
timeout 90 python -c "import jax; print(jax.devices())" || exit 1
# 1. eval e2e at best serving config with the n_rows-restricted JV solver
#    (vs 18.45 clips/s recorded pre-change in /tmp/measure_r3.log)
timeout 1800 python bench.py --mode eval-e2e --topk 8 --warp-free --precision 16
# 2. eval e2e dense parity config A/B (JV cut applies to the parity path too;
#    vs r2 13.40 clips/s)
timeout 1800 python bench.py --mode eval-e2e --precision 16
# 3. headline refresh: default bench (best-config train + dense parity in one)
timeout 4800 python bench.py
# 4. serving e2e trace at the best config: where do the post-JV-fix ms go?
timeout 2400 python tools/profile_eval.py 8 warpfree e2e
