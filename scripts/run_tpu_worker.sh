#!/bin/bash
# Supervision loop for scripts/tpu_worker.py.
#
# The worker exits rc 3 when its RSS passes the limit (clean restart point —
# between jobs, no in-flight TPU RPC) and rc 0 on /tmp/tpuq/QUIT. Anything
# else (crash) also restarts, after a cool-down: an OOM-killed JAX client can
# wedge the remote TPU for minutes (CLAUDE.md), so give it time to recover.
cd "$(dirname "$0")/.." || exit 1
while :; do
    python scripts/tpu_worker.py >> /tmp/tpu_worker.log 2>&1
    rc=$?
    if [ -f /tmp/tpuq/QUIT ]; then
        echo "[wrapper] QUIT present, stopping (rc=$rc)" >> /tmp/tpu_worker.log
        exit 0
    fi
    if [ "$rc" = 3 ]; then
        echo "[wrapper] rss-limit restart" >> /tmp/tpu_worker.log
    else
        echo "[wrapper] worker exited rc=$rc — cool-down 120s" >> /tmp/tpu_worker.log
        sleep 120
    fi
done
