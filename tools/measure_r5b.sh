#!/bin/bash
# Round-5 phase B — encoder-packing A/B on TPU (after measure_r5.sh).
# Usage: nohup bash tools/measure_r5b.sh > /tmp/measure_r5b.log 2>&1 &
set -x
cd /root/repo
timeout 90 python -c "import jax; print(jax.devices())" || exit 1
# Encoder space-to-channel packing (FIERY_PACKED_ENCODER, round-4 VERDICT
# next #4): everything but the depthwise convs runs packed. Back-to-back in
# one process per config family via packed_space_ab-style fresh traces.
# Arms: all-r4-packing (baseline) vs +encoder, dense and combo.
timeout 3600 python tools/encoder_packed_ab.py
