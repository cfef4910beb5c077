#!/bin/bash
# Flagship-campaign supervisor (reference recipe: My_train.py:13-17, README.md:112).
#
# Re-launches the trainer every --exit_after N epochs so peak host RSS stays
# bounded (the relay transport retains ~1 byte/byte sent host->device —
# DESIGN.md "RSS slope root cause"). Each child exits cleanly after N epochs;
# we resume from its newest epoch checkpoint. Stop the campaign with
#   touch runs/campaign/STOP
# (checked between segments) or kill the child PID in runs/campaign/train.pid.
#
# Usage: scripts/campaign_supervisor.sh [NEPOCH] [EXIT_AFTER]
set -u
REPO=${REPO:-/root/repo}
CAMP=$REPO/runs/campaign
DATA=$CAMP/data
NEPOCH=${1:-270}
EXIT_AFTER=${2:-20}
SAVE=$CAMP/log
MODELS=$SAVE/uformer_c/models
mkdir -p "$CAMP"

cd "$REPO"
while true; do
    if [ -f "$CAMP/STOP" ]; then echo "[supervisor] STOP file - exiting"; break; fi
    RESUME_ARGS=""
    latest=$(ls -1 "$MODELS"/epoch_model_*.msgpack 2>/dev/null \
             | sed -E 's/.*epoch_model_([0-9]+)\.msgpack/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
    if [ -n "${latest:-}" ]; then
        ep=$(basename "$latest" | sed -E 's/epoch_model_([0-9]+)\.msgpack/\1/')
        if [ "$ep" -ge "$NEPOCH" ]; then echo "[supervisor] campaign complete at epoch $ep"; break; fi
        RESUME_ARGS="--resume --pretrain_weights $latest"
        echo "[supervisor] resuming from epoch $ep"
    fi
    # --device_data: whole patch set resident in HBM, crop/augment inside
    # the jitted step — zero per-step image transfers (r5: the per-transfer
    # buffer retention on the relay was exhausting the device arena every
    # 1-2 epochs, RESOURCE_EXHAUSTED in train.log)
    DEHAZE_TPU_MALLOC_TRIM=1 python -m dehaze_tpu.cli.train \
        --train_dir "$DATA/train_patches" --val_dir "$DATA/val_patches" \
        --train_ps 128 --batch_size 32 --embed_dim 32 \
        --nepoch "$NEPOCH" --warmup --keep_ckpts 5 --device_data \
        --exit_after "$EXIT_AFTER" --save_dir "$SAVE" --env _c \
        $RESUME_ARGS >> "$CAMP/train.log" 2>&1 &
    echo $! > "$CAMP/train.pid"
    wait "$(cat "$CAMP/train.pid")"
    rc=$?
    echo "[supervisor] segment exited rc=$rc"
    if [ "$rc" -ne 0 ] && [ -z "${latest:-}" ] && \
       ! ls "$MODELS"/epoch_model_*.msgpack >/dev/null 2>&1; then
        echo "[supervisor] first segment failed with no checkpoint - aborting"
        break
    fi
    sleep 5
done
