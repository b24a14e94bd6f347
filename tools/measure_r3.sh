#!/bin/bash
# Round-3 TPU measurement queue — run ONE at a time (remote compiles use host CPU).
# Usage: bash tools/measure_r3.sh 2>&1 | tee /tmp/measure_r3.log
set -x
cd /root/repo
# 0. tunnel probe
timeout 90 python -c "import jax; print(jax.devices())" || exit 1
# 1. round-2 open item: combo train (topk8 + prewarp + u16 descent default)
timeout 2400 python bench.py --topk 8 --prewarp
# 2. warp-free dense train A/B
timeout 2400 python bench.py --warp-free
# 3. full train combo: topk8 + prewarp + warp-free
timeout 2400 python bench.py --topk 8 --prewarp --warp-free
# 3b. trim-train A/B on the best train config
timeout 2400 python bench.py --topk 8 --prewarp --warp-free --trim-train
# 4. eval serving: trim now default (vs r2 30.15 clips/s at topk8, bf16 folded)
timeout 1800 python bench.py --mode eval --topk 8 --precision 16
# 5. eval serving + warp-free
timeout 1800 python bench.py --mode eval --topk 8 --warp-free --precision 16
# 6. eval serving e2e at best config (vs r2 16.45 at topk8)
timeout 1800 python bench.py --mode eval-e2e --topk 8 --warp-free --precision 16
