#!/bin/bash
# TPU-relay outage watchdog (DESIGN.md round-5 ops log: after a
# RESOURCE_EXHAUSTED cascade the relay far side can go silent —
# jax.devices() hangs in backend init and SIGTERM alone cannot kill the
# wedged client, hence `timeout -k`). Probes the relay with a tiny op
# every 2 min; on first success clears the campaign STOP file and
# relaunches the supervisor, so an outage costs only its own window.
#
# Usage: setsid nohup scripts/relay_watch.sh > /dev/null 2>&1 &
LOG=${RELAY_WATCH_LOG:-/tmp/relay_watch.log}
REPO=${REPO:-/root/repo}
echo "[watch] started $(date +%H:%M:%S)" >> "$LOG"
while true; do
    if timeout -k 10 90 python -c "import jax; print(float(jax.numpy.ones(4).sum()))" >/dev/null 2>&1; then
        echo "[watch] relay ALIVE $(date +%H:%M:%S) - resuming campaign" >> "$LOG"
        rm -f "$REPO/runs/campaign/STOP"
        cd "$REPO"
        nohup bash scripts/campaign_supervisor.sh 270 60 >> runs/campaign/supervisor.log 2>&1 &
        echo "[watch] supervisor relaunched pid $!" >> "$LOG"
        break
    fi
    echo "[watch] relay dead $(date +%H:%M:%S)" >> "$LOG"
    sleep 120
done
