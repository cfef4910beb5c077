#!/bin/bash
# Round-5 zoo redrive block (VERDICT r4 next #5): green swin + vgg chip
# evidence post-`a7e7bb2`/`260eb5d`, plus revalidation of 2-3 round-4
# matrix rows under the `transfer.wait` timing fix.
#
# Chip jobs — run AFTER the campaign supervisor exits (HBM is shared;
# verify skill "Environment gotchas"). Logs land under runs/zoo/.
set -u
REPO=${REPO:-/root/repo}
cd "$REPO"
OUT=$REPO/runs/zoo
mkdir -p "$OUT"

step() { echo "== [$(date +%H:%M:%S)] $*"; }

# 1. swin_t at 32^2 — the exact geometry that crashed in round 4
#    (stage downsampling reaches feature maps < window; windows now
#    collapse to the feature map). Train 1 epoch + predtime.
step "swin_t 32^2 train"
timeout 2400 python -m dehaze_tpu.cli.zoo train --name swin_t \
    --dataset synthetic --n_synth 256 --epochs 1 --batch_size 64 \
    --out "$OUT/swin_ck" > "$OUT/swin_train32.log" 2>&1
tail -n 3 "$OUT/swin_train32.log"

step "swin_t 32^2 predtime"
timeout 2400 python -m dehaze_tpu.cli.zoo predtime --name swin_t \
    --dataset synthetic --n_synth 128 --batch_size 128 --n 20 \
    > "$OUT/swin_predtime32.log" 2>&1
tail -n 3 "$OUT/swin_predtime32.log"

# 2. swin_t at the reference's native 224^2 (models/swin.py defaults).
step "swin_t 224^2 predtime"
timeout 3600 python -m dehaze_tpu.cli.zoo predtime --name swin_t \
    --dataset synthetic --n_synth 128 --image_size 224 \
    --batch_size 128 --n 10 > "$OUT/swin_predtime224.log" 2>&1
tail -n 3 "$OUT/swin_predtime224.log"

# 3. vgg_dnn_11 — the round-4 HTTP-413 family (weights baked into the HLO
#    by a jit closure; fixed by params-as-arguments in 260eb5d).
step "vgg_dnn_11 predtime"
timeout 2400 python -m dehaze_tpu.cli.zoo predtime --name vgg_dnn_11 \
    --dataset synthetic --n_synth 128 --batch_size 128 --n 20 \
    > "$OUT/vgg_predtime.log" 2>&1
tail -n 3 "$OUT/vgg_predtime.log"

# 4. Revalidate round-4 matrix rows post-jax-0.9 under transfer.wait
#    timing (VERDICT r4 weak #4): vit_ti (35.7 ms r4) + mixer_ti (27.7 ms).
for fam in vit_ti mixer_ti; do
  step "$fam predtime revalidation"
  timeout 2400 python -m dehaze_tpu.cli.zoo predtime --name "$fam" \
      --dataset synthetic --n_synth 128 --batch_size 128 --n 20 \
      > "$OUT/${fam}_reval.log" 2>&1
  tail -n 3 "$OUT/${fam}_reval.log"
done

step "zoo redrive done"
