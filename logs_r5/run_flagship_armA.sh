#!/bin/bash
# Arm A: r4 flagship recipe verbatim (fixed Adam 1e-4), 120 epochs, dense
# eval (12 points) + dense per-term loss prints (PRINT_FREQ 3 = 2
# lines/epoch) for the epoch-40-60 regression diagnosis.
#
# The remote compile service occasionally SIGKILLs its helper under load
# (HTTP 500 "tpu_compile_helper subprocess exit signal SIGKILL"); that is
# transient, so retry the whole one-shot loop. AUTO_RESUME + --resume make
# retries pick training up from the last snapshot instead of restarting.
cd /root/repo
export PALLAS_AXON_REMOTE_COMPILE=1
for attempt in 1 2 3 4 5 6; do
    echo "=== ARM_A attempt $attempt $(date -u +%H:%M:%S) ==="
    python tools/northstar_loop.py \
        --cfg experiments/cityscapes/northstar_flagship_128x256.yaml \
        --data data/synthetic_flagship --out output_northstar_flagship_r5 \
        --one-shot --resume --epochs 120 --eval-points 12 \
        --trajectory-out docs/northstar_flagship_r5_fixedlr.json \
        -- PRINT_FREQ 3 2>&1
    rc=$?
    echo "ARM_A_EXIT_CODE=$rc (attempt $attempt)"
    [ $rc -eq 0 ] && break
    sleep 60
done
echo "ARM_A_DONE rc=$rc"
